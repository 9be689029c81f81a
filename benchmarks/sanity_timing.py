"""Validate the scan-amortized timing protocol against physics.

Run this whenever a benchmark number looks too good (or a change to
benchmarks/_timing.py is proposed). It checks, on the live backend:

1. the per-dispatch floor (fresh-dispatch measurement — see _timing.py
   docstring for why repeated float() on one array measures ~0);
2. a known-FLOPs matmul: [1024,2820] @ [2820,1000] f32 = 5.78 GFLOP must
   land in a physically possible TFLOPS band for the chip (~50-200 eff
   TFLOPS on a v5e; thousands => the work was elided);
3. the full eval step's wall GROWS ~linearly with the scan length k, and
   the compiled program's cost_analysis FLOPs scale with k. If FLOPs
   scale but wall does not, the backend elided the loop body (the
   dead-salt trap in _timing.py); if FLOPs do not scale, tracing is wrong.

Inputs are salted through a LIVE tensor (x + salt*1e-12), never only the
RNG key: at sampling_steps=0 / sampling_noise=False the eval step is
provably key-independent and XLA hoists a key-only-salted body out of the
scan entirely (measured: zero convolutions left inside the while loop).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np


def raw_scan_walls(fn, *args, k=50, calls=6, want_flops=False):
    """Raw per-call walls of a k-iteration salted scan over fn (+FLOPs)."""
    import jax
    import jax.numpy as jnp

    def run(s0, *a):
        def body(c, i):
            out = fn(*a, s0 + i)
            tot = sum(jnp.sum(leaf).astype(jnp.float32)
                      for leaf in jax.tree_util.tree_leaves(out))
            return c + tot, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(k))
        return c

    comp = jax.jit(run).lower(0, *args).compile()
    flops = float("nan")
    if want_flops:
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        if ca:
            flops = ca.get("flops", float("nan"))
    float(comp(0, *args))            # warm
    walls = []
    for j in range(calls):
        t0 = time.perf_counter()
        float(comp((j + 1) * k, *args))
        walls.append(time.perf_counter() - t0)
    return walls, flops


def main():
    import jax
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    from _timing import dispatch_floor

    rng = np.random.default_rng(0)

    fl = dispatch_floor()
    print(f"dispatch floor: {fl*1e3:.3f} ms", flush=True)

    # -- check 2: known-FLOPs matmul ------------------------------------
    a = jnp.asarray(rng.standard_normal((1024, 2820)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((2820, 1000)).astype(np.float32))
    walls, _ = raw_scan_walls(lambda a, w, s: (a + s * 1e-12) @ w, a, w)
    per = (float(np.median(walls)) - fl) / 50 * 1e3
    print(f"matmul 5.78 GFLOP: {per:.4f} ms/iter -> "
          f"{5.78 / max(per, 1e-9):.0f} TFLOPS eff "
          f"(sane band ~50-200 on v5e)", flush=True)

    # -- check 3: eval-step wall must scale with k ----------------------
    from gdmcf_tpu.config import Config
    from gdmcf_tpu.train.trainer import Trainer
    n_user, n_item = 5949, 2810
    cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[1000], emb_size=10,
                 steps=5, noise_scale=0.01, batch_size=1024, sampling_steps=0)
    trainer = Trainer(cfg, n_user, n_item)
    state = trainer.init_state()
    x = jnp.asarray((rng.random((1024, n_item)) < 0.01).astype(np.float32))
    idx = jnp.asarray(np.arange(1024, dtype=np.int32))
    key = jax.random.PRNGKey(0)

    def eval_fn(p, x, i, m, s):
        # salt a LIVE tensor, not only the key (see module docstring)
        return trainer._eval_step_impl(p, x + s * 1e-12, i, m,
                                       jax.random.fold_in(key, s),
                                       sampling_steps=0, top_k=100)

    pers = []
    for k in (10, 50, 100):
        walls, flops = raw_scan_walls(eval_fn, state.params, x, idx, x,
                                      k=k, calls=4, want_flops=True)
        med = float(np.median(walls))
        per = (med - fl) / k * 1e3
        pers.append(per)
        print(f"k={k:4d} flops={flops/1e9:10.1f} G "
              f"walls(ms)={[f'{w*1e3:.1f}' for w in walls]} "
              f"per-iter={per:.4f} ms", flush=True)
    spread = max(pers) / max(min(pers), 1e-9)
    verdict = "OK" if spread < 1.5 else "SUSPECT (per-iter not k-stable)"
    print(f"eval per-iter across k: {['%.3f' % p for p in pers]} ms "
          f"-> {verdict}", flush=True)


if __name__ == "__main__":
    main()
