"""Multi-chip / multi-host scaling-efficiency benchmark.

Measures train-step throughput at fixed per-chip batch (weak scaling) across
mesh sizes, reporting efficiency vs the single-chip baseline — the
BASELINE.md ">=80% multi-host scaling efficiency" metric.

On a real slice (one process per host):
    COORDINATOR_ADDRESS=... NUM_PROCESSES=... PROCESS_ID=... \
        python benchmarks/scaling_bench.py --per-chip-batch 512

Multi-host prints ONE row per launch (the mesh must cover every device of a
live slice); launch on 1, 2, 4... hosts and combine rows for the curve.
Each row also reports dp-sharded eval-step throughput. On this 1-chip dev
container it degenerates to the single-chip row (the virtual CPU mesh
measures correctness, not bandwidth, so it is not used for efficiency
numbers).
"""

from __future__ import annotations

import argparse
import sys
sys.path.insert(0, "/root/repo")  # runnable without PYTHONPATH
import json
import time

import numpy as np


def measure_mesh(dp: int, mp: int, per_chip_batch: int, n_item: int,
                 iters: int = 20, warmup: int = 3):
    import jax

    from gdmcf_tpu.config import Config
    from gdmcf_tpu.train.trainer import Trainer

    batch = per_chip_batch * dp
    cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[1000], emb_size=10,
                 steps=5, noise_scale=0.01, batch_size=batch,
                 sampling_steps=0, mesh_dp=dp, mesh_mp=mp)
    trainer = Trainer(cfg, n_user=max(batch * 2, 8192), n_item=n_item)
    state = trainer.init_state()
    rng = np.random.default_rng(0)
    x = (rng.random((batch, n_item)) < 0.01).astype(np.float32)
    idx = np.arange(batch, dtype=np.int32)
    # multi-host: each process feeds ONLY its local slice of the global
    # batch (_put_batch assembles the dp-sharded global array)
    nproc, pid = jax.process_count(), jax.process_index()
    sl = slice(pid * (batch // nproc), (pid + 1) * (batch // nproc))
    xs, idxs = trainer._put_batch(x[sl], idx[sl])

    for _ in range(warmup):
        state, loss = trainer._train_step(state, xs, idxs)
    float(loss)  # value fetch: block_until_ready may not sync on dev relays
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = trainer._train_step(state, xs, idxs)
    float(loss)  # the state chain forces all iters to execute
    train_eps = batch * iters / (time.perf_counter() - t0)

    # eval-step throughput on the same mesh (dp-sharded multi-host eval:
    # each host scores its slice; output stays sharded — only metric sums
    # would cross hosts in a real evaluate())
    import jax.numpy as jnp
    key = jax.random.PRNGKey(0)
    salt = jnp.float32(1e-12)

    def ev(i):
        # salt the INPUT per call: at sampling_steps=0 the step is key
        # -independent, and byte-identical data-independent dispatches can
        # be elided on relayed backends
        return trainer._eval_step(state.params, xs + i * salt, idxs, xs,
                                  key, sampling_steps=0, top_k=100,
                                  shard_out=nproc > 1)

    def sync(a):  # sharded outputs are not fully addressable multi-host
        jax.block_until_ready(a)
        np.asarray(a.addressable_shards[0].data)  # value fetch (dev relays)

    sync(ev(0))  # compile
    t0 = time.perf_counter()
    pred = None
    for i in range(iters):
        pred = ev(i + 1)
    sync(pred)
    eval_ups = batch * iters / (time.perf_counter() - t0)
    return train_eps, eval_ups


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-chip-batch", type=int, default=512)
    ap.add_argument("--n-item", type=int, default=2810)
    ap.add_argument("--mp", type=int, default=1,
                    help="catalog-axis shards (fixed while dp scales)")
    args = ap.parse_args()

    from gdmcf_tpu.parallel import multihost
    multihost.initialize()
    import jax

    n = len(jax.devices())
    results = {}
    if jax.process_count() > 1:
        # a live slice can't shrink: one measurement per launch (the mesh
        # must cover every device); build the weak-scaling curve by
        # launching on 1, 2, 4... hosts and combining the printed rows
        dps = [n // args.mp]
    else:
        dps, dp = [], 1
        while dp * args.mp <= n:
            dps.append(dp)
            dp *= 2
    base_per_chip = None
    for dp in dps:
        eps, eval_ups = measure_mesh(dp, args.mp, args.per_chip_batch,
                                     args.n_item)
        if base_per_chip is None:
            base_per_chip = eps / dps[0]
        results[f"dp={dp},mp={args.mp}"] = {
            "examples_per_s": round(eps, 1),
            "efficiency": round((eps / dp) / base_per_chip, 4),
            "eval_users_per_s": round(eval_ups, 1),
        }
    if multihost.is_main_process():
        print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
