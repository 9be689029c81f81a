"""A/B the eval ranking select: one ``lax.top_k`` vs the exact chunked
select (``ops/topk.chunked_topk``) on the TPU.

Uses the scan-amortized protocol (benchmarks/_timing.py) — both plain
per-dispatch async timing AND per-dispatch value-fetch timing are
untrustworthy on this relay (the latter can report figures below the
measured ~2.5 ms per-execute floor via dispatch/fetch overlap).

Run:  python benchmarks/profile_topk.py [--batch 1024] [--n 2810] [--k 100]
"""

from __future__ import annotations

import argparse
import sys
sys.path.insert(0, "/root/repo")  # runnable without PYTHONPATH
sys.path.insert(0, "/root/repo/benchmarks")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--n", type=int, default=2810)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from _timing import scan_timeit
    from gdmcf_tpu.ops.topk import chunked_topk

    rng = np.random.default_rng(0)
    scores = jnp.asarray(
        rng.standard_normal((args.batch, args.n)).astype(np.float32))

    def bench(name, fn):
        # time the INDICES-ONLY output: the eval path discards the values
        # (`_, idx = ...`), so XLA DCEs the value side in production and the
        # A/B must let it do the same here
        ms = scan_timeit(lambda s, c: fn(s, c)[1], scores,
                         k=min(args.iters, 50))
        print(f"{name:24s} {ms:7.3f} ms", flush=True)
        return ms

    bench("lax.top_k",
          lambda s, c: jax.lax.top_k(s + c, args.k))
    for chunk in (256, 512, 1024):
        bench(f"chunked_topk({chunk})",
              lambda s, c, ch=chunk: chunked_topk(s + c, args.k, chunk=ch,
                                                  min_n=0))

    # correctness on-chip (ties at bf16 scale): exact index equality
    rv, ri = jax.lax.top_k(scores, args.k)
    cv, ci = chunked_topk(scores, args.k, min_n=0)
    same = bool(jnp.array_equal(ri, ci)) and bool(jnp.array_equal(rv, cv))
    print(f"exact match vs lax.top_k: {same}", flush=True)


if __name__ == "__main__":
    main()
