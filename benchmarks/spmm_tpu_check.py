"""Compiled-mode Pallas SpMM validation + micro-bench on the real TPU.

CPU tests run the kernel in interpret mode (tests/test_spmm.py); this script
runs the COMPILED Mosaic kernel on the chip and checks it against the dense
product, then times it against the gather-based reference implementation.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/spmm_tpu_check.py
"""

from __future__ import annotations

import sys
sys.path.insert(0, "/root/repo")  # runnable without PYTHONPATH

import numpy as np
import scipy.sparse as sp


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from gdmcf_tpu.ops.spmm import (_rebuild, block_sparse_arrays,
                                    block_sparse_meta, n_real_blocks, spmm,
                                    spmm_reference, to_block_sparse)

    rng = np.random.RandomState(0)

    def jit_spmm(a, fn=spmm, transpose=False, **kw):
        """Pass the sparse arrays as jit ARGUMENTS: closing over them embeds
        hundreds of MB of constants in the program (the remote-compile
        endpoint rejects such payloads with HTTP 413)."""
        meta = block_sparse_meta(a)

        @functools.partial(jax.jit)
        def run(arrays, x):
            return fn(_rebuild(meta, arrays), x, transpose=transpose, **kw)

        arrays = block_sparse_arrays(a)
        return lambda x: run(arrays, x)

    # correctness at a few geometries, forward and transpose (CSC view)
    for (rows, cols, density) in [(512, 512, 0.02), (2048, 1024, 0.005),
                                  (1024, 4096, 0.01)]:
        m = sp.random(rows, cols, density=density, random_state=rng,
                      dtype=np.float32, format="csr")
        a = to_block_sparse(m, br=128, bc=128)
        x = rng.randn(cols, 128).astype(np.float32)
        y = np.asarray(jit_spmm(a)(jnp.asarray(x)))
        expect = m.toarray() @ x
        err = np.abs(y[:rows] - expect).max() / max(np.abs(expect).max(), 1e-6)
        xt = rng.randn(rows, 128).astype(np.float32)
        yt = np.asarray(jit_spmm(a, transpose=True)(jnp.asarray(xt)))
        expect_t = m.toarray().T @ xt
        err_t = np.abs(yt[:cols] - expect_t).max() / max(
            np.abs(expect_t).max(), 1e-6)
        # TPU MXU default pass carries bf16 mantissas -> ~1e-3 relative
        status = "OK" if err < 5e-3 and err_t < 5e-3 else "FAIL"
        print(f"[{status}] {rows}x{cols} d={density}: max rel err {err:.2e} "
              f"(fwd) {err_t:.2e} (transpose)", flush=True)

    # micro-bench: LightGCN-propagation-like shape on a POWER-LAW bipartite
    # graph, degree-sorted so nonzeros cluster into the leading tiles — the
    # regime the block format targets (uniform-random sparsity degenerates to
    # ~1 nnz/tile and is served by the dense sharded path instead).
    from gdmcf_tpu.ops.spmm import degree_sort_permutation

    # sized so the densified tiles stay ~hundreds of MB: the dev tunnel's
    # host->device bandwidth dominates bulk uploads
    n_users, n_items, nnz = 16384, 16384, 600_000
    pop = 1.0 / np.arange(1, n_items + 1) ** 1.2
    pop /= pop.sum()
    rows_i = rng.randint(0, n_users, nnz)
    cols_i = rng.choice(n_items, size=nnz, p=pop)
    m = sp.csr_matrix((np.ones(nnz, np.float32), (rows_i, cols_i)),
                      shape=(n_users, n_items))
    m.data[:] = 1.0
    rp, cp = degree_sort_permutation(m)
    m = m[rp][:, cp].tocsr()
    a = to_block_sparse(m, br=128, bc=128, max_bytes=12 << 30)
    fill = m.nnz / (n_real_blocks(a) * a.br * a.bc)
    print(f"power-law graph: nnz={m.nnz}, tiles={n_real_blocks(a)}, "
          f"tile fill={fill:.3f}", flush=True)
    x = jnp.asarray(rng.randn(n_items, 128).astype(np.float32))

    sys.path.insert(0, "/root/repo/benchmarks")
    from _timing import scan_timeit

    expect = m @ np.asarray(x)
    meta = block_sparse_meta(a)
    arrays = block_sparse_arrays(a)
    for name, fn, kw in (("pallas-stream", spmm, {"x_vmem": False}),
                         ("pallas-vmem-x", spmm, {"x_vmem": True}),
                         ("gather-ref", spmm_reference, {})):
        got = np.asarray(jit_spmm(a, fn=fn, **kw)(x))[: m.shape[0]]
        rel = np.abs(got - expect).max() / max(np.abs(expect).max(), 1e-6)
        assert rel < 5e-3, f"{name} wrong: rel err {rel:.2e}"
        # scan-amortized timing (see benchmarks/_timing.py: per-dispatch
        # protocols are untrustworthy on this relay)
        dt = scan_timeit(
            lambda ar, xx, s, fn=fn, kw=kw: fn(_rebuild(meta, ar),
                                               xx + s * 1e-12, **kw),
            arrays, x, k=15, calls=5) / 1e3
        gflops = 2 * m.nnz * x.shape[1] / dt / 1e9
        print(f"{name}: {dt * 1e3:.2f} ms  ({gflops:.1f} sparse-GFLOP/s)",
              flush=True)


if __name__ == "__main__":
    main()
