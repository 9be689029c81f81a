"""End-to-end epoch wall at the Yelp recipe + eval_batches_per_call A/B.

VERDICT r2 weak item 3: the eval-side dispatch fusion existed but the
default (1) had no recorded measurement. This drives the PRODUCTION fit()
loop (packed wire, k-fused train, eval-every-5 with cached eval batches)
at the Yelp geometry and reports per-epoch walls, separating train-only
epochs from eval epochs, for each eval_batches_per_call setting.

    python benchmarks/epoch_wall.py --epochs 21 --fuse 1 4 8

Timing note: per-epoch walls are seconds-scale and bracketed by real value
fetches (fit reads the epoch loss and the eval metrics), so they are
trustworthy on the relay (docs/BENCH_NOTES.md measurement rule) even
though they include the ~25 ms/dispatch relay RTT wherever a dispatch is
not amortized.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")

N_USER, N_ITEM = 5949, 2810


class EpochTimer:
    """metric_logger duck type: timestamps every epoch boundary."""

    def __init__(self):
        self.rows = []  # (epoch, had_eval, wall_s)
        self._last = time.perf_counter()
        self._evals = set()

    def metrics(self, epoch, **kw):
        now = time.perf_counter()
        self.rows.append((epoch, epoch in self._evals, now - self._last))
        self._last = now

    def eval_results(self, epoch, split, topn, results):
        self._evals.add(epoch)


def run(fuse: int, epochs: int, data) -> dict:
    from gdmcf_tpu.config import Config
    from gdmcf_tpu.train.trainer import Trainer

    train_csr, valid_csr, test_csr, n_user, n_item = data
    cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[1000], emb_size=10,
                 lr=1e-5, batch_size=1024, steps=5,
                 noise_schedule="linear-var", noise_scale=0.01,
                 noise_min=0.001, noise_max=0.01, sampling_steps=0,
                 mean_type="x0", reweight=True, epochs=epochs, eval_every=5,
                 eval_batches_per_call=fuse, random_seed=0, debug=True)
    trainer = Trainer(cfg, n_user, n_item)
    col = EpochTimer()
    t0 = time.perf_counter()
    trainer.fit(train_csr, valid_csr, test_csr, log=lambda *a: None,
                metric_logger=col)
    total = time.perf_counter() - t0

    # steady state: skip the first train epoch and the first eval epoch
    # (program compiles); split the rest
    train_walls = [w for e, ev, w in col.rows if not ev and e > 1]
    eval_walls = [w for e, ev, w in col.rows if ev]
    eval_steady = eval_walls[1:] if len(eval_walls) > 1 else eval_walls
    return {
        "eval_batches_per_call": fuse,
        "epochs": epochs,
        "total_wall_s": round(total, 1),
        "train_epoch_s": round(float(np.mean(train_walls)), 3),
        "eval_epoch_s": round(float(np.mean(eval_steady)), 3),
        "eval_overhead_s": round(float(np.mean(eval_steady))
                                 - float(np.mean(train_walls)), 3),
        "first_epoch_s": round(col.rows[0][2], 1),
        "first_eval_epoch_s": round(eval_walls[0], 1) if eval_walls else None,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=21)
    ap.add_argument("--fuse", type=int, nargs="+", default=[1, 4, 8])
    opts = ap.parse_args()

    from gdmcf_tpu.data.loader import data_load, generate_synthetic_dataset

    data_dir = os.path.join(tempfile.gettempdir(),
                            f"epoch_wall_{N_USER}x{N_ITEM}")
    if not os.path.exists(os.path.join(data_dir, "train_list.npy")):
        generate_synthetic_dataset(data_dir, n_user=N_USER, n_item=N_ITEM,
                                   avg_degree=12, seed=0)
    data = data_load(os.path.join(data_dir, "train_list.npy"),
                     os.path.join(data_dir, "valid_list.npy"),
                     os.path.join(data_dir, "test_list.npy"))

    for fuse in opts.fuse:
        print(json.dumps(run(fuse, opts.epochs, data)), flush=True)


if __name__ == "__main__":
    main()
