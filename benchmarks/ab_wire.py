"""A/B the wire format on REAL-FEED training epochs (host->device included).

bench.py measures compute-only throughput (broadcast batches, no per-step
transfer); this drives full train_epoch passes — C++/numpy assembly,
prefetch, host->device transfer, k-fused steps — so the packed format's
32x transfer cut actually shows. Run on the relay AND on real hardware.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/ab_wire.py \
          [--users 5949 --items 2810 --batch 1024 --epochs 3 --k 100]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=5949)
    ap.add_argument("--items", type=int, default=2810)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--dims", type=int, default=1000)
    args = ap.parse_args()
    # k-fusion only engages when an epoch has >= k batches (train_epoch runs
    # the remainder as single steps); cap it so the A/B actually measures
    # the fused path instead of 15 dispatch-floor-dominated single steps
    n_batches = max(args.users // args.batch, 1)
    if args.k > n_batches:
        print(f"capping k {args.k} -> {n_batches} (batches per epoch)")
        args.k = n_batches

    from gdmcf_tpu.config import Config
    from gdmcf_tpu.data.loader import DiffusionDataset
    from gdmcf_tpu.train.trainer import Trainer
    import scipy.sparse as sp

    rng = np.random.default_rng(0)
    deg = 12
    users = np.repeat(np.arange(args.users), deg)
    items = rng.integers(0, args.items, users.size)
    csr = sp.csr_matrix((np.ones(users.size, np.float32), (users, items)),
                        shape=(args.users, args.items))
    csr.data[:] = 1.0  # dedupe counts -> binary

    for wf in ("f32", "packed", "f32", "packed"):  # ABAB for drift
        cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[args.dims],
                     emb_size=10, steps=5, noise_scale=0.01,
                     batch_size=args.batch, lr=1e-5, rng_impl="rbg",
                     sampling_steps=0, train_steps_per_call=args.k,
                     wire_format=wf)
        trainer = Trainer(cfg, args.users, args.items)
        state = trainer.init_state()
        ds = DiffusionDataset(csr)
        state, _ = trainer.train_epoch(state, ds, np.random.default_rng(1))
        t0 = time.perf_counter()
        for e in range(args.epochs):
            state, loss = trainer.train_epoch(state, ds,
                                              np.random.default_rng(2 + e))
        wall = time.perf_counter() - t0
        n_steps = args.epochs * (args.users // args.batch)
        eps = n_steps * args.batch / wall
        print(f"wire={wf:6s} {wall:6.2f}s for {args.epochs} epochs "
              f"({eps:,.0f} examples/s fed)", flush=True)


if __name__ == "__main__":
    main()
