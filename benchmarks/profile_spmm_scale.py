"""Decompose the scale-pretrain SpMM cost at the 1M x 200k geometry.

Times (scan-amortized protocol, benchmarks/_timing.py) on the hybrid
format actually used by the pretrain: the tile-kernel product alone, the
COO-remainder pass alone, and the full hybrid product — forward and
transpose — so the 1.71 s/BPR-step figure (8 products) can be attributed.

Run:  python benchmarks/profile_spmm_scale.py [--users 1000000]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=1_000_000)
    ap.add_argument("--items", type=int, default=200_000)
    ap.add_argument("--avg-degree", type=int, default=10)
    ap.add_argument("--alpha", type=float, default=1.6)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--min-fill", type=int, default=4)
    ap.add_argument("--only", type=str, default="",
                    help="substring filter over case names")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from _timing import scan_timeit
    from scale_smoke import synthetic_csr

    from gdmcf_tpu.ops.spmm import (degree_sort_permutation, hybrid_arrays,
                                    hybrid_meta, hybrid_spmm, n_real_blocks,
                                    spmm_op, to_hybrid)

    rng = np.random.default_rng(0)
    m = synthetic_csr(rng, args.users, args.items,
                      avg_degree=args.avg_degree, alpha=args.alpha)
    rp, cp = degree_sort_permutation(m)
    m = m.tocsr()[rp][:, cp].tocsr()
    h = to_hybrid(m, br=8, bc=128, min_fill=args.min_fill)
    meta = hybrid_meta(h)
    arrays = hybrid_arrays(h)
    ta, rr, rc, rv = arrays
    print(f"graph {args.users} x {args.items} nnz {m.nnz}: "
          f"{n_real_blocks(h.tiles)} tiles + {h.rem_vals.shape[0]} COO",
          flush=True)

    x_items = jnp.asarray(
        rng.standard_normal((args.items, args.dim)).astype(np.float32))
    x_users = jnp.asarray(
        rng.standard_normal((args.users, args.dim)).astype(np.float32))
    # forward kernel output rows: row tiles grouped 128//br per grid step
    br = 8
    n_row_tiles = -(-args.users // br)
    y_rows = -(-n_row_tiles // (128 // br)) * 128

    def coo_only(rr, rc, rv, x, n_out, s):
        contrib = rv[:, None] * x[rc, :]
        return jnp.zeros((n_out, x.shape[1]), jnp.float32).at[rr].add(contrib)

    cases = [
        ("tiles fwd", lambda ta, x, s:
            spmm_op(meta, False, False, ta, x + s * 1e-12), (ta, x_items)),
        ("tiles transpose", lambda ta, x, s:
            spmm_op(meta, True, False, ta, x + s * 1e-12), (ta, x_users)),
        ("coo fwd", lambda rr, rc, rv, x, s:
            coo_only(rr, rc, rv, x + s * 1e-12, args.users, s),
            (rr, rc, rv, x_items)),
        ("coo transpose", lambda rr, rc, rv, x, s:
            coo_only(rc, rr, rv, x + s * 1e-12, args.items, s),
            (rr, rc, rv, x_users)),
        ("hybrid fwd", lambda ar, x, s:
            hybrid_spmm(meta, ar, x + s * 1e-12), (arrays, x_items)),
        ("hybrid transpose", lambda ar, x, s:
            hybrid_spmm(meta, ar, x + s * 1e-12, transpose=True),
            (arrays, x_users)),
        # diagnostics: which piece stops composing inside one program
        ("tiles+add1", lambda ta, x, s:
            spmm_op(meta, False, False, ta, x + s * 1e-12) + 1.0,
            (ta, x_items)),
        ("tiles+scatter-nogather", lambda ta, rr, rv, x, s:
            spmm_op(meta, False, False, ta, x + s * 1e-12)
            + jnp.zeros((y_rows, x.shape[1]), jnp.float32)
              .at[rr].add(rv[:, None]), (ta, rr, rv, x_items)),
        ("tiles+gather-noscatter", lambda ta, rc, rv, x, s:
            spmm_op(meta, False, False, ta, x + s * 1e-12)
            + (rv[:, None] * x[rc, :]).sum(), (ta, rc, rv, x_items)),
        ("tiles+scatter-sorted", lambda ta, rr, rc, rv, x, s:
            spmm_op(meta, False, False, ta, x + s * 1e-12)
            + jnp.zeros((y_rows, x.shape[1]), jnp.float32)
              .at[rr].add(rv[:, None] * x[rc, :], indices_are_sorted=True),
            (ta, rr, rc, rv, x_items)),
        ("tiles+segsum-sorted", lambda ta, rr, rc, rv, x, s:
            spmm_op(meta, False, False, ta, x + s * 1e-12)
            + jax.ops.segment_sum(rv[:, None] * x[rc, :], rr,
                                  num_segments=y_rows,
                                  indices_are_sorted=True),
            (ta, rr, rc, rv, x_items)),
        ("scatter-sorted only", lambda rr, rc, rv, x, s:
            jnp.zeros((y_rows, x.shape[1]), jnp.float32)
              .at[rr].add(rv[:, None] * (x[rc, :] + s * 1e-12),
                          indices_are_sorted=True),
            (rr, rc, rv, x_items)),
        ("scatter only w128", lambda rr, rc, rv, x, s:
            jnp.zeros((y_rows, max(128, x.shape[1])), jnp.float32)
              .at[rr].add(jnp.pad(rv[:, None] * (x[rc, :] + s * 1e-12),
                                  ((0, 0),
                                   (0, max(0, 128 - x.shape[1])))),
                          indices_are_sorted=True),
            (rr, rc, rv, x_items)),
        ("coo fwd replica", lambda rr, rc, rv, x, s:
            coo_only(rr, rc, rv, x + s * 1e-12, args.users, s),
            (rr, rc, rv, x_items)),
    ]
    for name, fn, operands in cases:
        if args.only and args.only not in name:
            continue
        ms = scan_timeit(fn, *operands, k=5, calls=4)
        print(f"{name:18s} {ms:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
