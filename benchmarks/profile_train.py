"""Bisect the training-step cost on-chip with value-forced timing.

Pieces (Yelp geometry, batch 1024): forward-only loss, forward+backward,
full step (+AdamW +Lt), corruption only, NT-Xent only. All timed with the
chunk-fetch method (async timing is untrustworthy on the relay).

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/profile_train.py
"""

from __future__ import annotations

import time
import sys
sys.path.insert(0, "/root/repo")  # runnable without PYTHONPATH

import numpy as np


def chunk_time(fn, arg, iters=30, chunk=10):
    """fn: arg -> (arg, scalar). Times with a value fetch per chunk."""
    out = arg
    for _ in range(3):
        out, s = fn(out)
    float(s)
    t0 = time.perf_counter()
    for _ in range(iters // chunk):
        for _ in range(chunk):
            out, s = fn(out)
        float(s)
    wall = time.perf_counter() - t0
    # subtract the per-chunk dispatch+fetch floor, measured with FRESH
    # dispatches (float() on the already-materialized s reads the cached
    # value in ~0 and would subtract nothing). NOTE: this per-dispatch
    # protocol still pays the ~2.5 ms execute floor per chunk — treat its
    # attributions as coarse; _timing.scan_timeit is the trustworthy form.
    from _timing import dispatch_floor
    rtt = dispatch_floor()
    return max(wall - (iters // chunk) * rtt, 1e-9) / iters * 1000


def main():
    import jax
    import jax.numpy as jnp

    from gdmcf_tpu.config import Config
    from gdmcf_tpu.diffusion.engine import LtState
    from gdmcf_tpu.train.trainer import Trainer

    B, N = 1024, 2810
    cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[1000], emb_size=10,
                 steps=5, noise_scale=0.01, batch_size=B, lr=1e-5,
                 sampling_steps=0)
    tr = Trainer(cfg, n_user=5949, n_item=N)
    state = tr.init_state()
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.random((B, N)) < 0.01).astype(np.float32))
    idx = jnp.asarray(np.arange(B, dtype=np.int32))
    lt = LtState.create(cfg.steps)
    key = jax.random.PRNGKey(0)

    # (the full production step runs LAST: its donation consumes the state)

    # 2. forward-only loss (key threaded so calls differ)
    @jax.jit
    def fwd(k):
        k, sub = jax.random.split(k)
        loss, _, _ = tr.diffusion.training_losses(
            tr.model.apply, state.params, x, idx, sub, lt, train=True)
        return k, loss.mean()

    ms_fwd = chunk_time(fwd, key)
    print(f"loss forward only:      {ms_fwd:7.2f} ms", flush=True)

    # 3. forward+grad, no optimizer
    @jax.jit
    def vjp(k):
        k, sub = jax.random.split(k)

        def loss_fn(p):
            loss, _, _ = tr.diffusion.training_losses(
                tr.model.apply, p, x, idx, sub, lt, train=True)
            return loss.mean()

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return k, loss + sum(jnp.sum(g * 0) for g in jax.tree_util.tree_leaves(grads))

    ms_vjp = chunk_time(vjp, key)
    print(f"forward + backward:     {ms_vjp:7.2f} ms", flush=True)

    # 4. corruption channels only
    @jax.jit
    def corrupt(k):
        k, k1, k2, k3 = jax.random.split(k, 4)
        ts = jax.random.randint(k1, (B,), 0, cfg.steps)
        x_tU = tr.diffusion.corrupt_discrete(k2, ts, x)
        noise = jax.random.normal(k3, x.shape)
        x_t = tr.diffusion.q_sample(x, ts, noise)
        return k, x_t.sum() + x_tU.sum()

    ms_cor = chunk_time(corrupt, key)
    print(f"corruption only:        {ms_cor:7.2f} ms", flush=True)

    # 5. model forward only (fixed inputs except key-driven dropout)
    x_U = jnp.stack([1.0 - x, x], axis=-1)
    ts0 = jnp.zeros((B,), jnp.int32)

    @jax.jit
    def model_fwd(k):
        k, sub = jax.random.split(k)
        out, closs = tr.model.apply(state.params, x, ts0, x_U, index=idx,
                                    graph=x_U, rcloss=True, train=True,
                                    rng=sub)
        return k, out.sum() + closs

    ms_model = chunk_time(model_fwd, key)
    print(f"model fwd (train mode): {ms_model:7.2f} ms", flush=True)

    # 1. full production step (donates the state; must be last)
    def full(carry):
        st = carry
        st, loss = tr._train_step(st, x, idx)
        return st, loss

    ms_full = chunk_time(full, state)
    print(f"full train step:        {ms_full:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
