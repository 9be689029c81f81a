"""Tie-neutral OneHotMatrix=1 parity comparator.

Why this exists: the reference's OH1 eval zeroes every score <= 0.1
(main.py:290-295), which leaves only ~a dozen live scores per user; top-k
positions beyond that prefix are zero-score TIES whose order is torch's
heap-internal noise. Measured consequence (docs/PARITY.md): at IDENTICAL
weights and bit-identical p_sample scores, the reference's own pipeline
reports test R@20 0.41 while a lowest-index tie order reports 0.53 on a
popularity-sorted catalog — 30% of the headline metric is tie noise the
reference's semantics simply do not determine.

So the OH1 parity gate ranks BOTH sides' raw final score matrices
(reference_runner --dump-scores / parity_run --dump-scores) through ONE
shared deterministic pipeline — threshold, history mask, stable argsort —
and counts a hit ONLY where the score is live (> 0 after thresholding).
Tie positions contribute nothing on either side; what remains measures the
trained model, not the sort's tie order.

    python benchmarks/oh1_neutral_eval.py --data-dir /tmp/synth_oh1 \
        --ref '/tmp/oh1/ref_s*.npy' --ours '/tmp/oh1/jax.s*.npy' \
        [--tolerance 1.0]
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np

TOPK = 100
CUTS = [10, 20, 50, 100]


def neutral_metrics(scores: np.ndarray, mask: np.ndarray, gt: np.ndarray,
                    thres: float = 0.1):
    """Shared pipeline: zero <=thres, -inf history, stable rank, live-only
    hits. Returns {cut: (recall, ndcg)} averaged reference-style (recall
    denominator = |GT|, NDCG = DCG/IDCG over the cut)."""
    s = np.where(scores <= thres, 0.0, scores).astype(np.float64)
    s[mask > 0] = -np.inf
    order = np.argsort(-s, axis=1, kind="stable")[:, :TOPK]
    vals = np.take_along_axis(s, order, axis=1)
    live = vals > 0.0
    hit = np.take_along_axis(gt, order, axis=1) > 0
    hit = hit & live  # tie positions can never count
    n_gt = gt.sum(axis=1)
    keep = n_gt > 0
    out = {}
    for k in CUTS:
        h = hit[:, :k]
        recall = (h.sum(axis=1) / np.maximum(n_gt, 1))[keep].mean()
        disc = 1.0 / np.log2(np.arange(2, k + 2))
        dcg = (h * disc).sum(axis=1)
        idcg = np.array([disc[: int(min(g, k))].sum() for g in n_gt])
        ndcg = (dcg / np.maximum(idcg, 1e-12))[keep].mean()
        out[k] = (float(recall), float(ndcg))
    return out


def load_data(data_dir, n_rows):
    import sys

    sys.path.insert(0, "/root/repo")
    from gdmcf_tpu.data.loader import data_load

    train_csr, valid_csr, test_csr, n_user, n_item = data_load(
        os.path.join(data_dir, "train_list.npy"),
        os.path.join(data_dir, "valid_list.npy"),
        os.path.join(data_dir, "test_list.npy"))
    train = np.asarray(train_csr.todense(), np.float32)[:n_rows]
    valid = np.asarray(valid_csr.todense(), np.float32)[:n_rows]
    test = np.asarray(test_csr.todense(), np.float32)[:n_rows]
    return train, valid, test


def side(paths, train, valid, test):
    rows = []
    for p in paths:
        scores = np.load(p)
        n = scores.shape[0]
        m_tv = np.clip(train[:n] + valid[:n], 0, 1)
        v = neutral_metrics(scores, train[:n], valid[:n])
        t = neutral_metrics(scores, m_tv, test[:n])
        rows.append({"path": os.path.basename(p),
                     "valid": {k: [round(x, 4) for x in v[k]] for k in v},
                     "test": {k: [round(x, 4) for x in t[k]] for k in t}})
    return rows


def band(vals, widen):
    lo, hi = min(vals), max(vals)
    pad = widen * max(hi - lo, 0.01 * max(abs(hi), 1e-9))
    return lo - pad, hi + pad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--ref", required=True)
    ap.add_argument("--ours", required=True)
    ap.add_argument("--tolerance", type=float, default=1.0)
    opts = ap.parse_args()

    ref_paths = sorted(glob.glob(opts.ref))
    our_paths = sorted(glob.glob(opts.ours))
    assert ref_paths and our_paths, "no score files matched"
    n_rows = np.load(ref_paths[0]).shape[0]
    train, valid, test = load_data(opts.data_dir, max(n_rows, 1))

    ref_rows = side(ref_paths, train, valid, test)
    our_rows = side(our_paths, train, valid, test)

    checks = {}
    for name, cut, idx in (("test_recall@20", 20, 0), ("test_ndcg@20", 20, 1)):
        ref_vals = [r["test"][cut][idx] for r in ref_rows]
        our_vals = [r["test"][cut][idx] for r in our_rows]
        lo, hi = band(ref_vals, opts.tolerance)
        checks[name] = all(lo <= v <= hi for v in our_vals)

    print(json.dumps({"reference": ref_rows, "gdmcf_tpu": our_rows,
                      "checks": checks,
                      "parity": all(checks.values())}, indent=2))


if __name__ == "__main__":
    main()
