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
    ap.add_argument("--eval-users", type=int, default=0,
                    help="after --train-steps, compose the full sharded eval "
                         "path at the same geometry: N synthetic eval users "
                         "streamed through evaluate_streaming (NativeCSR "
                         "input/GT, packed transport, catalog-sharded "
                         "scores + top-k merge, device metric sums) with "
                         "finite/in-range assertions (VERDICT r4 item 5)")
    ap.add_argument("--eval-fuse", type=int, default=0,
                    help="override eval_batches_per_call (0 = config "
                         "default 8). At [batch, 1M-item] score widths the "
                         "8-batch fused eval program overflows one chip's "
                         "HBM — use 1 there")
    ap.add_argument("--skip-dense-check", action="store_true",
                    help="skip the dense-evaluate equality legs (they "
                         "materialize [eval_users, items] f32 on ONE "
                         "device — 16 GB at 4096 x 1M, fine on the "
                         "125 GB-host virtual mesh, OOM on a 16 GB chip). "
                         "The equality is proven on the virtual mesh; the "
                         "chip run records the wall number")
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

        extra = ({"eval_batches_per_call": args.eval_fuse}
                 if args.eval_fuse else {})
        cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[args.dims],
                     emb_size=10, steps=5, noise_scale=0.01,
                     batch_size=args.batch, topN=[10, 20], lr=1e-4,
                     debug=True, sampling_steps=0, host_dense=False,
                     mesh_dp=args.mesh_dp, mesh_mp=args.mesh_mp, **extra)
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
        if args.eval_users:
            from gdmcf_tpu.data.native import NativeCSR

            # eval rows are users [0, eval_users) of the full-geometry
            # model (real uid lookups into the sharded 10M-row table);
            # history/GT stay O(nnz) on the host and ride the packed wire
            ev = synthetic_csr(rng, args.eval_users, args.items)
            gt = synthetic_csr(rng, args.eval_users, args.items,
                               avg_degree=3)
            inp, gtn = NativeCSR.from_scipy(ev), NativeCSR.from_scipy(gt)
            t2 = time.time()
            res = trainer.evaluate_streaming(state, [inp], gtn, [inp],
                                             trainer.cfg.topN,
                                             drop_last=False)
            ew = time.time() - t2
            flat = [float(v) for grp in res for v in grp]
            assert flat and all(np.isfinite(v) for v in flat), res
            assert all(0.0 <= v <= 1.0 for v in flat), res
            nb = -(-args.eval_users // args.batch)
            print(f"EVAL_OK users={args.eval_users} items={args.items} "
                  f"wall={ew:.1f}s ({ew / nb * 1e3:.0f} ms/batch incl "
                  f"compile) metrics={[[round(v, 4) for v in g] for g in res]}",
                  flush=True)
            t3 = time.time()
            res_w = trainer.evaluate_streaming(state, [inp], gtn, [inp],
                                               trainer.cfg.topN,
                                               drop_last=False)
            ew2 = time.time() - t3
            fw = [float(v) for grp in res_w for v in grp]
            np.testing.assert_allclose(fw, flat, atol=1.01e-4)
            print(f"EVAL_STEADY wall={ew2:.1f}s "
                  f"({ew2 / nb * 1e3:.0f} ms/batch warm)", flush=True)
            if args.skip_dense_check:
                print("scale steps-only ok (dense check skipped): "
                      f"{args.train_steps} steps, total {time.time()-t0:.1f}s")
                return
            # correctness gate with teeth: the streamed/sharded/packed path
            # must equal the dense evaluate() on the same rows + state (the
            # [eval_users, n_item] dense slice is small even at 1M items)
            rows = np.asarray(ev.todense(), dtype=np.float32)
            gtd = np.asarray(gt.todense(), dtype=np.float32)
            res_d = trainer.evaluate(state, rows, gtd, rows,
                                     trainer.cfg.topN)
            flat_d = [float(v) for grp in res_d for v in grp]
            np.testing.assert_allclose(flat, flat_d, atol=1.01e-4,
                                       err_msg="streaming (sharded) eval "
                                       "!= dense eval at identical state")
            # second leg with guaranteed-live signal (metrics == 0 on both
            # sides would also "match"): GT = the input rows, NO history
            # mask — reconstruction retrieval is nonzero even near-random
            # at the largest cutoff, so the equality compares real numbers
            empty = NativeCSR.from_scipy(
                sp.csr_matrix((args.eval_users, args.items),
                              dtype=np.float32))
            # cutoff ~items/128 -> ~12 expected hits per avg_degree even
            # under a fully random ranking: all-zero here means a real bug
            topn_live = [min(max(args.items // 128, 100), 8192)]
            res2 = trainer.evaluate_streaming(state, [inp], inp, [empty],
                                              topn_live, drop_last=False)
            res2_d = trainer.evaluate(state, rows, rows,
                                      np.zeros_like(rows), topn_live)
            f2 = [float(v) for grp in res2 for v in grp]
            f2d = [float(v) for grp in res2_d for v in grp]
            np.testing.assert_allclose(f2, f2d, atol=1.01e-4)
            assert max(f2) > 0.0, ("reconstruction-retrieval leg returned "
                                   "all-zero metrics", res2)
            print(f"EVAL_MATCHES_DENSE live_leg_max={max(f2):.4f}",
                  flush=True)
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
