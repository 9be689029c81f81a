"""Bisect the eval-step latency: which piece costs what on the TPU.

Times, at Yelp geometry (batch 1024 x 2810 items, dims [1000], 5 steps):
  1. one jitted model forward (eval mode)
  2. p_sample scan alone
  3. p_sample + mask + top-k (the full eval step)
  4. RNG-only kernel (the per-step bernoulli traffic)
  5. 1-3 again under --rng rbg (faster TPU PRNG)

Uses the scan-amortized protocol (benchmarks/_timing.py): on this relayed
backend ``block_until_ready`` does not synchronize, repeated identical
async calls can be elided, and even per-dispatch value-fetch timing
under-reports via dispatch/fetch overlap — the original async version of
this script reported top_k(100) at 2.3 ms and the per-dispatch fetch
version at 0.36 ms; the scan-amortized figure (cross-checked against the
train-step protocol) is ~1.8 ms.

Run:  python benchmarks/profile_eval.py [--rng rbg]
"""

from __future__ import annotations

import argparse
import sys
sys.path.insert(0, "/root/repo")  # runnable without PYTHONPATH
sys.path.insert(0, "/root/repo/benchmarks")

import numpy as np

from _timing import scan_timeit as timeit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rng", choices=["threefry2x32", "rbg"],
                    default="threefry2x32")
    ap.add_argument("--batch", type=int, default=1024)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_default_prng_impl", args.rng)
    import jax.numpy as jnp

    from gdmcf_tpu.config import Config
    from gdmcf_tpu.train.trainer import Trainer

    n_user, n_item = 5949, 2810
    cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[1000], emb_size=10,
                 steps=5, noise_scale=0.01, batch_size=args.batch,
                 sampling_steps=0)
    trainer = Trainer(cfg, n_user, n_item)
    state = trainer.init_state()
    rng = np.random.default_rng(0)
    b = args.batch
    x = jnp.asarray((rng.random((b, n_item)) < 0.01).astype(np.float32))
    idx = jnp.asarray(np.arange(b, dtype=np.int32))
    x_U = jnp.stack([1.0 - x, x], axis=-1)
    t = jnp.zeros((b,), jnp.int32)
    key = jax.random.PRNGKey(0)

    fwd = jax.jit(lambda p, x, t, xu, i, s: trainer.model.apply(
        p, x + s * 1e-12, t, xu, index=i, graph=xu, rcloss=False,
        train=False, rng=None)[0])
    ms_fwd = timeit(fwd, state.params, x, t, x_U, idx)
    print(f"[{args.rng}] 1 model forward:      {ms_fwd:8.2f} ms", flush=True)

    # x + s*1e-12: at sampling_steps=0 these are key-INDEPENDENT — a key
    # -only salt leaves the body loop-invariant and XLA hoists it (the trap
    # this file's docstring warns about; the fwd case above salts the same way)
    psample = jax.jit(lambda p, x, i, s: trainer.diffusion.p_sample(
        trainer.model.apply, p, x + s * 1e-12, i,
        jax.random.fold_in(key, s), sampling_steps=0))
    ms_ps = timeit(psample, state.params, x, idx)
    print(f"[{args.rng}] p_sample (5 steps):   {ms_ps:8.2f} ms", flush=True)

    eval_fn = jax.jit(lambda p, x, i, m, s: trainer._eval_step_impl(
        p, x + s * 1e-12, i, m, jax.random.fold_in(key, s),
        sampling_steps=0, top_k=100))
    ms_eval = timeit(eval_fn, state.params, x, idx, x)
    print(f"[{args.rng}] full eval step:       {ms_eval:8.2f} ms", flush=True)

    rng_kernel = jax.jit(lambda s: [
        jax.random.bernoulli(kk, 0.5, (b, n_item))
        for kk in jax.random.split(jax.random.fold_in(key, s), 5)])
    ms_rng = timeit(rng_kernel)
    print(f"[{args.rng}] 5x bernoulli [B,n]:   {ms_rng:8.2f} ms", flush=True)

    topk = jax.jit(lambda sc, s: jax.lax.top_k(sc + s * 1e-12, 100))
    scores = jnp.asarray(rng.standard_normal((b, n_item)).astype(np.float32))
    ms_topk = timeit(topk, scores)
    print(f"[{args.rng}] top_k(100):           {ms_topk:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
