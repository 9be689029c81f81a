"""A/B the NT-Xent inner form on the full fused train step (on-chip).

profile_train3 attributed ~0.21 ms of the 1.75 ms step to the NT-Xent
softmax fwd+bwd. The "lse" form computes only the row logsumexp and the
diagonal (off-diagonal mass = 1 - diag since softmax rows sum to 1) —
algebraically identical, never materializes the normalized [B, B] matrix.
Whether that beats XLA's scheduling of the softmax form is an empirical
question (cf. the fused-AdamW dead end: a "saving" that breaks XLA's
overlap loses). Flip models.layers._NT_XENT_IMPL only on a win here.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/ab_ntxent.py
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--batch", type=int, default=None,
                    help="override batch size (default: the recipe's 1024). "
                         "probe_mxu.py showed the quadratic [B,B] NT-Xent "
                         "term dominating the step at 4096 — the regime "
                         "where the forms can actually differ")
    ap.add_argument("--impls", nargs="+",
                    default=["softmax", "lse", "remat"],
                    help="forms to A/B (each runs twice, ABAB, for drift)")
    args = ap.parse_args()

    import gdmcf_tpu.models.layers as layers
    from benchmarks.profile_train2 import fused_time, make_trainer

    over = {"batch_size": args.batch} if args.batch else {}
    for impl in list(args.impls) * 2:  # ABAB for drift
        layers._NT_XENT_IMPL = impl
        tr = make_trainer(**over)
        ms = fused_time(tr, args.iters, args.k, batch=args.batch)
        print(f"ntxent={impl:8s} {ms:6.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
