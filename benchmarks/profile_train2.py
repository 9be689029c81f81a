"""Decompose the k-fused train step: matmul floor vs everything else.

Round-2 state: the full fused step is ~2.1 ms on-chip at batch 1024 while its
matmul FLOPs (~130 GFLOP, cost-analysis) would take ~0.7 ms at v5e bf16 peak.
This profiler times VARIANT programs with the exact bench.py protocol (k
steps fused per dispatch, value fetch per call, RTT subtracted) to locate the
gap. Variants toggle real config knobs (gcnLayerNum, dropout, noise_type) or
run reduced skeleton programs at identical shapes.

Run (serialize with other TPU work):
  PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/profile_train2.py
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

N_USER, N_ITEM = 5949, 2810
B = 1024


def fused_time(trainer, iters, k, batch=None):
    """bench.py measure(): per-step ms of the k-fused production program."""
    import jax.numpy as jnp
    b = batch or B
    state = trainer.init_state()
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.random((b, N_ITEM)) < 0.01).astype(np.float32))
    # permutation truncates silently when b > n_user; sample with
    # replacement past that point (a batch can repeat users)
    idx = (rng.permutation(N_USER)[:b] if b <= N_USER
           else rng.integers(0, N_USER, size=b))
    idx = jnp.asarray(idx.astype(np.int32))
    xs = jnp.broadcast_to(x, (k,) + x.shape)
    iis = jnp.broadcast_to(idx, (k,) + idx.shape)
    state, losses = trainer._train_multi(state, xs, iis)
    assert np.isfinite(float(losses.sum()))
    # FRESH dispatches for the floor: float() on one already-materialized
    # scalar reads the cached value (~0) and under-subtracts the RTT ~5x
    from _timing import dispatch_floor
    rtt = dispatch_floor()
    n_calls = max(iters // k, 2)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, losses = trainer._train_multi(state, xs, iis)
        float(losses.sum())
    wall = time.perf_counter() - t0
    return max(wall - n_calls * rtt, 1e-9) / (n_calls * k) * 1000


def skeleton_time(iters, k, with_backward=True):
    """The four big matmul chains of the flagship step at identical shapes,
    fwd(+bwd), k-fused — the MXU floor for this architecture."""
    import jax
    import jax.numpy as jnp

    d = 1000
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    params = {
        "w1": jax.random.normal(ks[0], (N_ITEM + 10, d)) * 0.01,
        "w2": jax.random.normal(ks[1], (2 * N_ITEM + 10, d)) * 0.01,
        "gcn1": jax.random.normal(ks[2], (3 * d, 512)) * 0.01,
        "gcn2": jax.random.normal(ks[3], (512, 3 * d)) * 0.01,
        "item": jax.random.normal(ks[4], (N_ITEM, 3 * d)) * 0.01,
    }
    x1 = jax.random.normal(ks[5], (B, N_ITEM + 10))
    x2 = jnp.concatenate([x1, x1[:, : N_ITEM]], axis=1)

    def loss_fn(p):
        h = jnp.tanh(x1 @ p["w1"])
        h_u = jnp.tanh(x2 @ p["w2"])
        sim = h @ h_u.T                        # NT-Xent matmul
        hc = jnp.concatenate([h, h_u, h], axis=1)
        g = jnp.tanh(hc @ p["gcn1"]) @ p["gcn2"]   # GCN user rows
        scores = (hc + g) @ p["item"].T        # cosine head matmul
        return scores.sum() + sim.sum()

    def step(p, _):
        if with_backward:
            l, grads = jax.value_and_grad(loss_fn)(p)
            p = jax.tree_util.tree_map(lambda a, g: a - 1e-9 * g, p, grads)
        else:
            l = loss_fn(p)
        return p, l

    @jax.jit
    def multi(p, seed):
        # seed perturbation so repeated calls differ (relay elision guard)
        p = jax.tree_util.tree_map(
            lambda a: a + seed.astype(a.dtype) * 1e-12, p)
        return jax.lax.scan(step, p, jnp.arange(k))

    seed = jnp.asarray(0.0)
    p, ls = multi(params, seed)
    float(ls.sum())
    s = ls.sum()
    t0 = time.perf_counter()
    for _ in range(5):
        float(s)
    rtt = (time.perf_counter() - t0) / 5
    n_calls = max(iters // k, 2)
    t0 = time.perf_counter()
    for i in range(n_calls):
        p, ls = multi(p, jnp.asarray(float(i)))
        float(ls.sum())
    wall = time.perf_counter() - t0
    return max(wall - n_calls * rtt, 1e-9) / (n_calls * k) * 1000


def make_trainer(**over):
    from gdmcf_tpu.config import Config
    from gdmcf_tpu.train.trainer import Trainer
    kw = dict(backbone="DNNOneHotEmbeddingGCN", dims=[1000], emb_size=10,
              steps=5, noise_scale=0.01, noise_min=0.001, noise_max=0.01,
              batch_size=B, lr=1e-5, rng_impl="rbg", sampling_steps=0,
              train_steps_per_call=100)
    kw.update(over)
    return Trainer(Config(**kw), n_user=N_USER, n_item=N_ITEM)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of variant names to run")
    args = ap.parse_args()

    variants = {
        "full": dict(),
        "no_gcn": dict(gcnLayerNum=0),
        "no_dropout": dict(dropout=0.0),
        "no_discrete_tower": dict(noise_type=2),  # x_U tower fed x instead
        "threefry": dict(rng_impl="threefry2x32"),
    }
    results = {}
    for name, over in variants.items():
        if args.only and name not in args.only:
            continue
        tr = make_trainer(**over)
        ms = fused_time(tr, args.iters, args.k)
        results[name] = ms
        print(f"{name:22s} {ms:6.3f} ms/step", flush=True)
    if not args.only or "skeleton" in (args.only or []):
        ms = skeleton_time(args.iters, args.k, with_backward=True)
        results["matmul_skeleton"] = ms
        print(f"{'matmul_skeleton':22s} {ms:6.3f} ms/step (fwd+bwd floor)",
              flush=True)
        ms_f = skeleton_time(args.iters, args.k, with_backward=False)
        results["matmul_fwd_only"] = ms_f
        print(f"{'matmul_fwd_only':22s} {ms_f:6.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
