"""Probe the 48%-MXU matmul story (VERDICT r3 next-round item 6).

BENCH_NOTES attributes the flagship step's remaining matmul gap to operand
bandwidth: the towers' [batch, 2810/3000/1000] weight matrices stream ~34 MB
per pass, so at batch 1024 each weight byte is reused only ~batch times and
the MXU stalls on HBM. If that story is right, whole-step MFU must RISE with
arithmetic intensity — i.e. with batch (weights amortized over more rows)
— and stay roughly flat-to-falling with dims at fixed batch (weight bytes
grow ~dims^2 together with flops, intensity pinned by batch). If MFU is flat
in batch, the bandwidth claim is wrong and there is schedule/layout headroom.

Runs bench.measure_mfu (scan-amortized protocol, the only trustworthy
timing on this relay — docs/BENCH_NOTES.md) over batch {1024, 2048, 4096}
x dims {500, 1000, 2000} sweeps and prints one JSON line per config plus a
markdown table for BENCH_NOTES. TPU-serialized: run alone on the chip.

    python benchmarks/probe_mxu.py [--iters 1000]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import measure_mfu  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[1024, 2048, 4096])
    ap.add_argument("--dims", type=int, nargs="+", default=[500, 1000, 2000])
    opts = ap.parse_args()

    rows = []
    # sweep 1: batch at the recipe dims [1000]
    for b in opts.batches:
        out = measure_mfu(batch=b, iters=opts.iters, dims=(1000,))
        row = {"sweep": "batch", "batch": b, "dims": [1000], **out}
        rows.append(row)
        print(json.dumps(row), flush=True)
    # sweep 2: dims at the recipe batch 1024 (skip 1000 only if sweep 1
    # already produced the batch=1024, dims=[1000] anchor row)
    have_anchor = any(r["batch"] == 1024 for r in rows)
    for d in opts.dims:
        if d == 1000 and have_anchor:
            continue
        out = measure_mfu(batch=1024, iters=opts.iters, dims=(d,))
        row = {"sweep": "dims", "batch": 1024, "dims": [d], **out}
        rows.append(row)
        print(json.dumps(row), flush=True)

    print()
    print("| batch | dims | GF/step | step ms | eff TFLOP/s | MFU % |")
    print("|---|---|---|---|---|---|")
    for r in sorted(rows, key=lambda r: (r["dims"][0], r["batch"])):
        print(f"| {r['batch']} | {r['dims'][0]} | {r['flops_per_step']} "
              f"| {r['onchip_step_ms']} | {r['eff_tflops']} "
              f"| {r['mfu_pct']} |")


if __name__ == "__main__":
    main()
