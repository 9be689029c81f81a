"""LightGCN-pretrainer golden parity: the ACTUAL reference script vs ours.

Side A runs ``/root/reference/lightGCN.py`` itself via runpy — no code
copied — with the minimal documented runtime repairs:

  * the live ``pdb.set_trace()`` in its BPR loader (ref lightGCN.py:248-249)
    is patched to a no-op;
  * matplotlib is forced to the Agg backend (the script plots, never shows);
  * cwd is pointed at a scratch dir so its hardcoded relative CSV path
    (``../datasets/ml-100k/u.data``, ref :14) resolves to a synthetic
    ml-100k-shaped dataset (the real ml-100k does not ship anywhere in this
    container);
  * per-batch prints are redirected to a log file.

Side B runs ``gdmcf_tpu.models.lightgcn.pretrain`` on the SAME CSV through
``data.loader.load_ml100k`` (bit-identical ingest: same sklearn split seed).
Both sides use the reference's hardcoded recipe (3 layers, dim 64, 30
epochs, batch 1024, Adam lr 5e-3, decay 1e-4, K=10; ref :251-259).

Parity is distributional (torch vs JAX RNG): final-epoch
recall/precision/NDCG/MAP@10 of every ours-seed must fall inside the
reference's cross-seed band (widened by --tolerance), and tail BPR losses
must overlap.

    JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python \
        benchmarks/lightgcn_parity.py --out docs/parity_data/lightgcn_parity.json
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def run_reference(csv_path: str, seed: int, scratch: str) -> dict:
    """Execute the reference script in a patched subprocess-like env and
    harvest its module-level metric lists."""
    import runpy
    import subprocess

    # the script runs at import with module-level state; isolate each seed in
    # a fresh subprocess so torch/pandas globals cannot leak between runs
    driver = os.path.join(scratch, f"ref_driver_{seed}.py")
    datadir = os.path.join(scratch, "datasets", "ml-100k")
    os.makedirs(datadir, exist_ok=True)
    dst = os.path.join(datadir, "u.data")
    if not os.path.exists(dst):
        import shutil
        shutil.copy(csv_path, dst)
    workdir = os.path.join(scratch, "run")
    os.makedirs(workdir, exist_ok=True)
    with open(driver, "w") as fh:
        fh.write(f"""
import json, os, random, runpy, sys
import matplotlib
matplotlib.use("Agg")
import numpy as np
import pdb
pdb.set_trace = lambda *a, **kw: None  # ref lightGCN.py:248-249 live trace
import torch
random.seed({seed}); np.random.seed({seed}); torch.manual_seed({seed})
os.chdir({workdir!r})
import contextlib
with open("ref_stdout.log", "w") as log, contextlib.redirect_stdout(log):
    g = runpy.run_path("/root/reference/lightGCN.py", run_name="__main__")
out = dict(recall=g["recall_list"], precision=g["precision_list"],
           ndcg=g["ndcg_list"], map=g["map_list"],
           loss=g["loss_list_epoch"], mf_loss=g["MF_loss_list_epoch"],
           n_users=int(g["n_users"]), n_items=int(g["n_items"]))
print(json.dumps(out))
""")
    t0 = time.time()
    proc = subprocess.run([sys.executable, driver], capture_output=True,
                          text=True, timeout=3600,
                          env={**os.environ, "MPLBACKEND": "Agg",
                               "JAX_PLATFORMS": "cpu",
                               "PYTHONPATH": "/root/repo"})
    if proc.returncode != 0:
        raise RuntimeError(f"reference run failed:\n{proc.stderr[-3000:]}")
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    out["elapsed_s"] = round(time.time() - t0, 1)
    out["seed"] = seed
    return out


def run_ours(csv_path: str, seed: int) -> dict:
    from gdmcf_tpu.data.loader import load_ml100k
    from gdmcf_tpu.models.lightgcn import pretrain

    train_csr, test_csr, n_users, n_items = load_ml100k(csv_path)
    lines: list[str] = []
    t0 = time.time()
    pretrain(train_csr, test_csr, n_layers=3, latent_dim=64, epochs=30,
             batch_size=1024, lr=0.005, decay=1e-4, k=10, seed=seed,
             log=lines.append)
    out: dict = {"recall": [], "precision": [], "ndcg": [], "map": [],
                 "loss": [], "n_users": n_users, "n_items": n_items,
                 "seed": seed}
    for ln in lines:
        parts = ln.split()
        d = {parts[i].split("@")[0]: float(parts[i + 1])
             for i in range(2, len(parts), 2)}
        out["loss"].append(round(d["loss"], 4))
        for k in ("recall", "precision", "ndcg", "map"):
            out[k].append(round(d[k], 4))
    out["elapsed_s"] = round(time.time() - t0, 1)
    return out


def band(vals, widen):
    lo, hi = min(vals), max(vals)
    pad = widen * max(hi - lo, 0.02 * max(abs(hi), 1e-9))
    return lo - pad, hi + pad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scratch", default="/tmp/lightgcn_parity")
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--tolerance", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    opts = ap.parse_args()

    from gdmcf_tpu.data.loader import generate_ml100k_csv

    os.makedirs(opts.scratch, exist_ok=True)
    csv_path = os.path.join(opts.scratch, "u.data")
    if not os.path.exists(csv_path):
        generate_ml100k_csv(csv_path, n_user=400, n_item=600, avg_degree=40,
                            seed=0)

    refs, ours = [], []
    for s in opts.seeds:
        r = run_reference(csv_path, s, opts.scratch)
        print(f"ref seed {s}: final r/p/n/m = {r['recall'][-1]}/"
              f"{r['precision'][-1]}/{r['ndcg'][-1]}/{r['map'][-1]} "
              f"({r['elapsed_s']}s)", flush=True)
        refs.append(r)
    for s in opts.seeds:
        o = run_ours(csv_path, s)
        print(f"ours seed {s}: final r/p/n/m = {o['recall'][-1]}/"
              f"{o['precision'][-1]}/{o['ndcg'][-1]}/{o['map'][-1]} "
              f"({o['elapsed_s']}s)", flush=True)
        ours.append(o)

    checks = {}
    for m in ("recall", "precision", "ndcg", "map"):
        lo, hi = band([r[m][-1] for r in refs], opts.tolerance)
        checks[f"final_{m}@10"] = all(lo <= o[m][-1] <= hi for o in ours)
    tail = lambda xs: float(np.mean(xs[-8:]))
    lo, hi = band([tail(r["loss"]) for r in refs], opts.tolerance)
    checks["tail_bpr_loss"] = all(lo <= tail(o["loss"]) <= hi for o in ours)

    result = {"reference": refs, "gdmcf_tpu": ours, "checks": checks,
              "parity": all(checks.values())}
    print(json.dumps({"checks": checks, "parity": result["parity"]},
                     indent=2))
    if opts.out:
        with open(opts.out, "w") as fh:
            json.dump(result, fh)


if __name__ == "__main__":
    main()
