"""Bisect the eval-step latency: which piece costs what on the TPU.

Times, at Yelp geometry (batch 1024 x 2810 items, dims [1000], 5 steps):
  1. one jitted model forward (eval mode)
  2. p_sample scan alone
  3. p_sample + mask + top-k (the full eval step)
  4. RNG-only kernel (the per-step bernoulli traffic)
  5. 1-3 again under --rng rbg (faster TPU PRNG)

Run:  python benchmarks/profile_eval.py [--rng rbg]
"""

from __future__ import annotations

import argparse
import sys
sys.path.insert(0, "/root/repo")  # runnable without PYTHONPATH
import time

import numpy as np


def timeit(fn, *args, iters=20, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0


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

    fwd = jax.jit(lambda p, x, t, xu, i: trainer.model.apply(
        p, x, t, xu, index=i, graph=xu, rcloss=False, train=False, rng=None)[0])
    ms_fwd = timeit(fwd, state.params, x, t, x_U, idx)
    print(f"[{args.rng}] 1 model forward:      {ms_fwd:8.2f} ms")

    psample = jax.jit(lambda p, x, i, k: trainer.diffusion.p_sample(
        trainer.model.apply, p, x, i, k, sampling_steps=0))
    ms_ps = timeit(psample, state.params, x, idx, key)
    print(f"[{args.rng}] p_sample (5 steps):   {ms_ps:8.2f} ms")

    ms_eval = timeit(lambda: trainer._eval_step(
        state.params, x, idx, x, key, sampling_steps=0, top_k=100))
    print(f"[{args.rng}] full eval step:       {ms_eval:8.2f} ms")

    rng_kernel = jax.jit(lambda k: [
        jax.random.bernoulli(kk, 0.5, (b, n_item))
        for kk in jax.random.split(k, 5)])
    ms_rng = timeit(rng_kernel, key)
    print(f"[{args.rng}] 5x bernoulli [B,n]:   {ms_rng:8.2f} ms")

    topk = jax.jit(lambda s: jax.lax.top_k(s, 100))
    scores = jnp.asarray(rng.standard_normal((b, n_item)).astype(np.float32))
    ms_topk = timeit(topk, scores)
    print(f"[{args.rng}] top_k(100):           {ms_topk:8.2f} ms")


if __name__ == "__main__":
    main()
