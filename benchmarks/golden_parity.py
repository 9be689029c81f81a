"""Compare reference_runner.py and parity_run.py outputs -> parity verdict.

    python benchmarks/golden_parity.py --ref /tmp/ref_parity_s*.json \
        --ours /tmp/jax_parity.json [--markdown]

Checks (distributional parity — torch/JAX RNG streams differ by design).
GATING: tail training loss and FINAL-eval Recall@20 / NDCG@20 must fall
within the reference's cross-seed band (widened by --tolerance). Best-epoch
metrics are REPORTED but deliberately not gated: the quirk-selected "best"
is a knife-edge stopping time whose epoch can differ across frameworks at
identical quality.
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


def final_metrics(run):
    """Last-eval test Recall@20/NDCG@20 — more stable across seeds than the
    quirk-selected best (the reference's mixed valid/test selection freezes
    'best' at a noise-dependent early epoch)."""
    evs = run.get("evals") or []
    if not evs:
        return (np.nan, np.nan)
    last = evs[-1]
    test = last["test"] if isinstance(last, dict) and "test" in last else None
    if test is None:
        return (np.nan, np.nan)
    return (test[RECALL][K20], test[NDCG][K20])


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

    ref_b = [best_metrics(r) for r in ref_runs]
    our_b = [best_metrics(r) for r in ours]
    ref_f = [final_metrics(r) for r in ref_runs]
    our_f = [final_metrics(r) for r in ours]
    ref_l = [tail_loss(r["losses"]) for r in ref_runs]
    our_l = [tail_loss(r["losses"]) for r in ours]

    # GATING checks: final-eval metrics and tail loss. The quirk-selected
    # "best" is deliberately NOT a gate: under the reference's mixed
    # valid/test selection (main.py:362-363) the stored best is a stopping
    # time of a knife-edge race (valid must cross the test value stored at a
    # noise-dependent early epoch) — its cross-seed variance spans
    # 0.31-0.40 NDCG@20 within EITHER implementation, so a 3-seed band
    # comparison of it is statistically meaningless. It is still reported.
    checks = {}
    for name, ref_vals, our_vals in (
            ("final_recall@20", [f[0] for f in ref_f], [f[0] for f in our_f]),
            ("final_ndcg@20", [f[1] for f in ref_f], [f[1] for f in our_f]),
            ("tail_loss", ref_l, our_l)):
        lo, hi = band(ref_vals, opts.tolerance)
        checks[name] = all(lo <= v <= hi for v in our_vals)

    result = {
        "reference": {"best": ref_b, "final": ref_f, "tail_loss": ref_l,
                      "best_epochs": [r.get("best_epoch") for r in ref_runs]},
        "gdmcf_tpu": {"best": our_b, "final": our_f, "tail_loss": our_l},
        "checks": checks,
        "parity": all(checks.values()),
    }
    print(json.dumps(result, indent=2))

    if opts.markdown:
        def fmt(pairs, i):
            return " / ".join(f"{p[i]:.4f}" for p in pairs)
        print()
        print("| Side | best R@20 | best N@20 | final R@20 | final N@20 "
              "| tail loss |")
        print("|---|---|---|---|---|---|")
        print(f"| reference (repaired torch) | {fmt(ref_b,0)} | {fmt(ref_b,1)}"
              f" | {fmt(ref_f,0)} | {fmt(ref_f,1)} | "
              + " / ".join(f"{v:.1f}" for v in ref_l) + " |")
        print(f"| gdmcf_tpu | {fmt(our_b,0)} | {fmt(our_b,1)} | {fmt(our_f,0)}"
              f" | {fmt(our_f,1)} | "
              + " / ".join(f"{v:.1f}" for v in our_l) + " |")


if __name__ == "__main__":
    main()
