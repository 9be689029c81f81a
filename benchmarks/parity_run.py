"""gdmcf_tpu side of the golden-parity protocol (VERDICT round-1 item 1).

Runs the same recipe as benchmarks/reference_runner.py (which drives the
actual repaired PyTorch reference) on the same synthetic dataset, and writes
the same JSON shape: per-epoch training losses + valid/test metrics every 5
epochs. Parity is distributional (torch and JAX RNG streams differ): loss
trajectories and metric plateaus must overlap within seed-to-seed variance.

    python benchmarks/parity_run.py --data-dir /tmp/synth_yelp \
        --backbone DNNOneHotEmbedding --epochs 150 --seeds 0 1 2 \
        --out /tmp/jax_parity.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


class Collector:
    """metric_logger duck type for Trainer.fit: records losses + evals."""

    def __init__(self):
        self.losses = []
        self.evals = {}

    def metrics(self, epoch, **kw):
        if "train_loss" in kw:
            self.losses.append(round(float(kw["train_loss"]), 6))

    def eval_results(self, epoch, split, topn, results):
        self.evals.setdefault(epoch, {})[split] = [
            [float(v) for v in group] for group in results]


def run_seed(opts, seed: int) -> dict:
    from gdmcf_tpu.config import Config
    from gdmcf_tpu.data.loader import data_load
    from gdmcf_tpu.train.trainer import Trainer

    train_csr, valid_csr, test_csr, n_user, n_item = data_load(
        os.path.join(opts.data_dir, "train_list.npy"),
        os.path.join(opts.data_dir, "valid_list.npy"),
        os.path.join(opts.data_dir, "test_list.npy"))

    cfg = Config(
        backbone=opts.backbone, dims=list(opts.dims), emb_size=10,
        lr=opts.lr, weight_decay=0.0, batch_size=opts.batch,
        steps=opts.steps, noise_schedule="linear-var",
        noise_scale=opts.noise_scale, noise_min=0.001, noise_max=0.01,
        sampling_steps=opts.sampling_steps, mean_type=opts.mean_type,
        reweight=bool(opts.reweight),
        OneHotMatrix=opts.OneHotMatrix, epochs=opts.epochs, eval_every=5,
        diffusion_variant=opts.variant,
        n_user_cap=opts.n_user_cap, fidelity=bool(opts.fidelity),
        random_seed=seed, debug=True,
        train_steps_per_call=1)
    trainer = Trainer(cfg, min(n_user, opts.n_user_cap or n_user), n_item)
    col = Collector()
    t0 = time.time()
    _state, best = trainer.fit(train_csr, valid_csr, test_csr,
                               log=lambda *a: None, metric_logger=col)
    out = {
        "seed": seed,
        "losses": col.losses,
        "evals": [{"epoch": e, **{k: v for k, v in ev.items()}}
                  for e, ev in sorted(col.evals.items())],
        "best_test": [[float(v) for v in g] for g in best] if best else None,
        "elapsed_s": round(time.time() - t0, 1),
    }
    if opts.dump_scores:
        # tie-neutral parity protocol: RAW final score matrix (no <=0.1
        # zeroing, no masking) — see reference_runner --dump-scores
        import jax
        import jax.numpy as jnp

        n_rows = min(n_user, opts.n_user_cap or n_user)
        dense = np.asarray(train_csr.todense(), dtype=np.float32)[:n_rows]
        bs = cfg.batch_size
        key = jax.random.PRNGKey(0)
        rows = []
        for start in range(0, (n_rows // bs) * bs, bs):
            x = jnp.asarray(dense[start:start + bs])
            b = x.shape[0]
            blk = (trainer._to_block_onehot(x)
                   if cfg.OneHotMatrix == 1 else x)
            s = trainer.diffusion.p_sample(
                trainer.model.apply, _state.params, blk,
                jnp.arange(start, start + b, dtype=jnp.int32), key,
                sampling_steps=cfg.sampling_steps,
                sampling_noise=cfg.sampling_noise)
            if cfg.OneHotMatrix == 1:
                s = s[:b, b:]
            rows.append(np.asarray(s))
        path = f"{opts.dump_scores}.s{seed}.npy"
        np.save(path, np.concatenate(rows, axis=0))
        out["scores_path"] = path
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--backbone", default="DNNOneHotEmbedding")
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--dims", type=int, nargs="+", default=[1000])
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--noise-scale", type=float, default=0.01)
    ap.add_argument("--sampling-steps", type=int, default=0)
    ap.add_argument("--mean-type", choices=["x0", "eps"], default="x0",
                    dest="mean_type")
    ap.add_argument("--reweight", type=int, default=1)
    ap.add_argument("--n-user-cap", type=int, default=3000)
    ap.add_argument("--fidelity", type=int, default=1)
    ap.add_argument("--OneHotMatrix", type=int, default=2)
    ap.add_argument("--variant", default="discrete",
                    choices=["discrete", "legacy", "ablation"])
    ap.add_argument("--dump-scores", default=None,
                    help="path stem for final raw score matrices "
                         "(<stem>.s<seed>.npy; tie-neutral OH1 protocol)")
    ap.add_argument("--out", default=None)
    opts = ap.parse_args()

    runs = [run_seed(opts, s) for s in opts.seeds]
    out = {"config": vars(opts), "runs": runs}
    if opts.out:
        with open(opts.out, "w") as fh:
            json.dump(out, fh)
    for r in runs:
        print(json.dumps({"seed": r["seed"], "best_test": r["best_test"],
                          "elapsed_s": r["elapsed_s"]}))


if __name__ == "__main__":
    main()
