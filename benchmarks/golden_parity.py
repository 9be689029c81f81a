"""Compare reference_runner.py and parity_run.py outputs -> parity verdict.

    python benchmarks/golden_parity.py --ref /tmp/ref_parity_s*.json \
        --ours /tmp/jax_parity.json [--markdown]

Checks (distributional parity — torch/JAX RNG streams differ by design):
  * final-quarter mean training loss within the cross-seed band of the other
    side (loss scales are comparable: same objective, same data, same recipe)
  * best-epoch test Recall@20 / NDCG@20 within the union of both sides'
    seed-to-seed ranges (widened by --tolerance)
"""

from __future__ import annotations

import argparse
import glob
import json

import numpy as np

K20 = 1  # index of cutoff 20 in topN [10, 20, 50, 100]
RECALL, NDCG = 1, 2


def load_ref(patterns):
    runs = []
    for pat in patterns:
        for path in sorted(glob.glob(pat)):
            with open(path) as fh:
                runs.append(json.load(fh))
    return runs


def best_metrics(run):
    bt = run.get("best_test")
    return (bt[RECALL][K20], bt[NDCG][K20]) if bt else (np.nan, np.nan)


def tail_loss(losses, frac=0.25):
    n = max(1, int(len(losses) * frac))
    return float(np.mean(losses[-n:]))


def band(vals, widen):
    lo, hi = min(vals), max(vals)
    pad = widen * max(hi - lo, 0.01 * max(abs(hi), 1e-9))
    return lo - pad, hi + pad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", nargs="+", required=True)
    ap.add_argument("--ours", required=True)
    ap.add_argument("--tolerance", type=float, default=1.0,
                    help="band widening as a multiple of the seed range")
    ap.add_argument("--markdown", action="store_true")
    opts = ap.parse_args()

    ref_runs = load_ref(opts.ref)
    with open(opts.ours) as fh:
        ours = json.load(fh)["runs"]

    ref_r = [best_metrics(r)[0] for r in ref_runs]
    ref_n = [best_metrics(r)[1] for r in ref_runs]
    our_r = [best_metrics(r)[0] for r in ours]
    our_n = [best_metrics(r)[1] for r in ours]
    ref_l = [tail_loss(r["losses"]) for r in ref_runs]
    our_l = [tail_loss(r["losses"]) for r in ours]

    checks = {}
    r_lo, r_hi = band(ref_r, opts.tolerance)
    n_lo, n_hi = band(ref_n, opts.tolerance)
    checks["recall@20"] = all(r_lo <= v <= r_hi for v in our_r)
    checks["ndcg@20"] = all(n_lo <= v <= n_hi for v in our_n)
    l_lo, l_hi = band(ref_l, opts.tolerance)
    checks["tail_loss"] = all(l_lo <= v <= l_hi for v in our_l)

    result = {
        "reference": {"recall@20": ref_r, "ndcg@20": ref_n,
                      "tail_loss": ref_l,
                      "best_epochs": [r.get("best_epoch") for r in ref_runs]},
        "gdmcf_tpu": {"recall@20": our_r, "ndcg@20": our_n,
                      "tail_loss": our_l},
        "checks": checks,
        "parity": all(checks.values()),
    }
    print(json.dumps(result, indent=2))

    if opts.markdown:
        def fmt(vals):
            return " / ".join(f"{v:.4f}" for v in vals)
        print()
        print("| Side | Recall@20 (seeds) | NDCG@20 (seeds) | tail loss |")
        print("|---|---|---|---|")
        print(f"| reference (repaired torch) | {fmt(ref_r)} | {fmt(ref_n)} "
              f"| {fmt(ref_l)} |")
        print(f"| gdmcf_tpu | {fmt(our_r)} | {fmt(our_n)} | {fmt(our_l)} |")


if __name__ == "__main__":
    main()
