"""End-to-end A/B: full eval step with chunked_topk vs plain lax.top_k.

The micro A/B (profile_topk.py) flipped when the timing protocol was
corrected to (a) measure the per-dispatch floor with fresh dispatches and
(b) time the indices-only output production actually uses. This script
settles the production question: the FULL eval step (p_sample scan + mask
+ top-k) at Yelp geometry, under the corrected scan-amortized harness,
with the trainer's top-k implementation swapped between the two choices.

Run:  python benchmarks/ab_eval_topk.py [--batch 1024] [--rng rbg]
"""

from __future__ import annotations

import argparse
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")

import numpy as np

from _timing import scan_timeit as timeit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rng", choices=["threefry2x32", "rbg"], default="rbg")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--items", type=int, default=2810)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_default_prng_impl", args.rng)
    import jax.numpy as jnp

    from gdmcf_tpu.config import Config
    from gdmcf_tpu.train.trainer import Trainer
    import gdmcf_tpu.ops.topk as topk_mod

    n_user, n_item = 5949, args.items
    cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[1000], emb_size=10,
                 steps=5, noise_scale=0.01, batch_size=args.batch,
                 sampling_steps=0)
    trainer = Trainer(cfg, n_user, n_item)
    state = trainer.init_state()
    rng = np.random.default_rng(0)
    b = args.batch
    x = jnp.asarray((rng.random((b, n_item)) < 0.01).astype(np.float32))
    idx = jnp.asarray(np.arange(b, dtype=np.int32))
    key = jax.random.PRNGKey(0)

    orig = topk_mod.chunked_topk

    # The salt must reach the TOWER INPUTS, not (only) the RNG key: at
    # sampling_steps=0 / sampling_noise=False the eval step is provably
    # key-independent (the directed-GCN user rows are graph-independent, so
    # the random synthetic graph is dead) and XLA hoists the whole body out
    # of the timing scan — a key-salted A/B here measures an empty loop.
    def run(label, impl):
        topk_mod.chunked_topk = impl
        eval_fn = jax.jit(lambda p, x, i, m, s: trainer._eval_step_impl(
            p, x + s * 1e-12, i, m, jax.random.fold_in(key, s),
            sampling_steps=0, top_k=100))
        ms = timeit(eval_fn, state.params, x, idx, x)
        print(f"[{args.rng}] eval step, {label:18s} {ms:8.3f} ms", flush=True)
        return ms

    try:
        a = run("chunked(512):", orig)
        p = run("plain lax.top_k:",
                lambda s, k, **kw: jax.lax.top_k(s, k))
        a2 = run("chunked(512) again:", orig)
    finally:
        topk_mod.chunked_topk = orig
    print(f"verdict: chunked {min(a, a2):.3f} vs plain {p:.3f} -> "
          f"{'chunked' if min(a, a2) < p else 'plain'} wins", flush=True)


if __name__ == "__main__":
    main()
