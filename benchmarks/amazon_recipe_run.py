"""Amazon-Book recipe end-to-end (VERDICT round-1 item 6).

Runs configs/amazonOneEmbGcn.yaml verbatim (batch 400 / dims [1024] /
lr 5e-5 / noise_scale 1e-4 / steps 5) on a synthetic amazon-shaped dataset,
in both fidelity modes, and prints a summary row for docs/BENCH_NOTES.md.

    python benchmarks/amazon_recipe_run.py [--epochs 30] [--users 12000]
        [--items 6000] [--out /tmp/amazon_run.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--users", type=int, default=12000)
    ap.add_argument("--items", type=int, default=6000)
    ap.add_argument("--data-dir", default="/tmp/synth_amazon")
    ap.add_argument("--fidelity", type=int, nargs="+", default=[1, 0])
    ap.add_argument("--out", default=None)
    opts = ap.parse_args()

    from gdmcf_tpu.config import load_config
    from gdmcf_tpu.data.loader import data_load, generate_synthetic_dataset
    from gdmcf_tpu.train.trainer import Trainer

    if not os.path.exists(os.path.join(opts.data_dir, "train_list.npy")):
        generate_synthetic_dataset(opts.data_dir, n_user=opts.users,
                                   n_item=opts.items, avg_degree=15, seed=1)
    train_csr, valid_csr, test_csr, n_user, n_item = data_load(
        os.path.join(opts.data_dir, "train_list.npy"),
        os.path.join(opts.data_dir, "valid_list.npy"),
        os.path.join(opts.data_dir, "test_list.npy"))
    print(f"amazon-shaped synthetic: {n_user} x {n_item}", flush=True)

    results = {}
    for fid in opts.fidelity:
        cfg = load_config("configs/amazonOneEmbGcn.yaml", overrides={
            "data_path": opts.data_dir, "epochs": opts.epochs,
            "fidelity": bool(fid), "debug": True})
        trainer = Trainer(cfg, n_user, n_item)
        t0 = time.time()
        losses = []

        class Log:
            def metrics(self, epoch, **kw):
                if "train_loss" in kw:
                    losses.append(float(kw["train_loss"]))

            def eval_results(self, *a):
                pass

        _state, best = trainer.fit(train_csr, valid_csr, test_csr,
                                   metric_logger=Log())
        dt = time.time() - t0
        results[f"fidelity={bool(fid)}"] = {
            "best_test": [[float(v) for v in g] for g in best] if best else None,
            "first_loss": losses[0] if losses else None,
            "last_loss": losses[-1] if losses else None,
            "elapsed_s": round(dt, 1),
        }
        print(json.dumps({f"fidelity={bool(fid)}":
                          results[f"fidelity={bool(fid)}"]}), flush=True)
    if opts.out:
        with open(opts.out, "w") as fh:
            json.dump(results, fh)


if __name__ == "__main__":
    main()
