"""Large-catalog smoke on real hardware: train + eval at a geometry where the
dense host path would be prohibitive, via host_dense=False (CSR-backed
batches + streamed metrics).

Default geometry: 100k users x 32,768 items (item table [32768, 3000] f32 =
0.4 GB; per-batch activations [1024, 32768]). Scales further with --mesh_mp
on a multi-chip slice.

Run:  PYTHONPATH=. python benchmarks/scale_smoke.py [--users 100000]
      [--items 32768] [--epochs 1]
Prints steady-state examples/s and one eval's metrics.
"""

from __future__ import annotations

import argparse
import sys
sys.path.insert(0, "/root/repo")  # runnable without PYTHONPATH
import time

import numpy as np
import scipy.sparse as sp


def synthetic_csr(rng, n_user, n_item, avg_degree=12, alpha=1.05):
    pop = 1.0 / np.arange(1, n_item + 1) ** alpha
    pop /= pop.sum()
    degrees = np.maximum(rng.poisson(avg_degree, n_user), 1)
    rows = np.repeat(np.arange(n_user), degrees)
    cols = rng.choice(n_item, size=degrees.sum(), p=pop)
    data = np.ones(len(rows), np.float32)
    m = sp.csr_matrix((data, (rows, cols)), shape=(n_user, n_item))
    m.data[:] = 1.0  # dedupe multiplicities
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=100_000)
    ap.add_argument("--items", type=int, default=32_768)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--dims", type=int, default=1000)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--mesh_dp", type=int, default=1)
    ap.add_argument("--mesh_mp", type=int, default=1)
    ap.add_argument("--eval_cap", type=int, default=None,
                    help="cap the number of users trained/evaluated "
                         "(host->device batch transfer over the dev tunnel "
                         "is the bottleneck at this geometry)")
    ap.add_argument("--train-steps", type=int, default=None,
                    help="steps-only mode: build + shard the full-geometry "
                         "model (row-sharded user/item tables, sharded "
                         "lookup) and take N real optimizer steps on "
                         "synthetic batches — no eval, no full-dataset "
                         "materialization. This is the 10M-user / 1M-item "
                         "BASELINE.md target mode.")
    ap.add_argument("--batch-pool", type=int, default=0,
                    help="cycle over N fixed synthetic batches instead of "
                         "fresh ones (gives the model signal to learn)")
    ap.add_argument("--assert-decreasing", action="store_true",
                    help="fail unless the last-fifth loss mean is below "
                         "the first-fifth mean")
    args = ap.parse_args()

    from gdmcf_tpu.config import Config
    from gdmcf_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)

    if args.train_steps:
        import jax
        import jax.numpy as jnp

        cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[args.dims],
                     emb_size=10, steps=5, noise_scale=0.01,
                     batch_size=args.batch, topN=[10, 20], lr=1e-4,
                     debug=True, sampling_steps=0, host_dense=False,
                     mesh_dp=args.mesh_dp, mesh_mp=args.mesh_mp)
        print(f"building trainer for {args.users} x {args.items}, "
              f"dims [{args.dims}], mesh ({args.mesh_dp},{args.mesh_mp})")
        trainer = Trainer(cfg, args.users, args.items)
        t0 = time.time()
        state = trainer.init_state()
        ut = state.params["embedding_user"]
        print(f"init {time.time()-t0:.1f}s; user table {ut.shape} "
              f"sharded over {len(ut.sharding.device_set)} device(s): "
              f"{ut.sharding}")
        pool = []
        if args.batch_pool:
            # fixed batch pool = a real (tiny) dataset cycled over epochs,
            # so the sharded program has signal to LEARN, not just execute —
            # the loss-goes-down upgrade of the round-2 "2 steps run" claim
            pool = [((rng.random((args.batch, args.items)) < 1e-4
                      ).astype(np.float32),
                     rng.integers(0, args.users, args.batch).astype(np.int32))
                    for _ in range(args.batch_pool)]
        losses = []
        for step in range(args.train_steps):
            if pool:
                x, idx = pool[step % len(pool)]
            else:
                x = (rng.random((args.batch, args.items)) < 1e-4
                     ).astype(np.float32)
                idx = rng.integers(0, args.users, args.batch).astype(np.int32)
            # host arrays go straight to _put_batch: an early jnp.asarray
            # commits the full dense batch to one device before resharding
            xs, idxs = trainer._put_batch(x, idx)
            t1 = time.time()
            state, loss = trainer._train_step(state, xs, idxs)
            loss = float(loss)  # value fetch: forces execution
            losses.append(loss)
            print(f"step {step}: loss {loss:.4f} "
                  f"({time.time()-t1:.1f}s)", flush=True)
        assert all(np.isfinite(losses)), losses
        if args.assert_decreasing:
            n = max(len(losses) // 5, 1)
            head, tail = np.mean(losses[:n]), np.mean(losses[-n:])
            assert tail < head, (
                f"sharded training did not learn: first-{n} mean {head:.4f} "
                f"<= last-{n} mean {tail:.4f}")
            print(f"loss decreased: first-{n} mean {head:.4f} -> "
                  f"last-{n} mean {tail:.4f}")
        print(f"scale steps-only ok: {args.train_steps} steps, "
              f"total {time.time()-t0:.1f}s")
        return
    print(f"building synthetic CSR {args.users} x {args.items} ...")
    train = synthetic_csr(rng, args.users, args.items)
    valid = synthetic_csr(rng, args.users, args.items, avg_degree=2)
    test = synthetic_csr(rng, args.users, args.items, avg_degree=3)
    print(f"train nnz: {train.nnz}")

    cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[args.dims],
                 emb_size=10, steps=5, noise_scale=0.01, batch_size=args.batch,
                 epochs=args.epochs, eval_every=args.epochs, topN=[10, 20],
                 lr=1e-4, debug=True, sampling_steps=0, host_dense=False,
                 mesh_dp=args.mesh_dp, mesh_mp=args.mesh_mp,
                 n_user_cap=args.eval_cap)
    trainer = Trainer(cfg, args.users, args.items)

    t0 = time.time()
    state, best = trainer.fit(train, valid, test)
    dt = time.time() - t0
    steps = int(state.step)
    print(f"total {dt:.1f}s for {steps} steps "
          f"(includes compile + {args.epochs // cfg.eval_every} evals)")
    print("best:", best)


if __name__ == "__main__":
    main()
