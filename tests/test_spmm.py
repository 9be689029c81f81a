"""Block-sparse SpMM: format converter, reference oracle, Pallas kernel
(interpret mode on CPU; compiled on TPU) vs dense matmul (SURVEY.md §4 #3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from gdmcf_tpu.ops.spmm import BlockSparse, spmm, spmm_reference, to_block_sparse


def random_sparse(rng, n_rows, n_cols, density=0.02):
    # derive the pattern from the fixture rng (a pinned RandomState(0) made
    # every test see one fixed matrix per shape, silently ignoring seeds)
    state = np.random.RandomState(int(rng.integers(2**31 - 1)))
    return sp.random(n_rows, n_cols, density=density, random_state=state,
                     dtype=np.float32, format="csr")


def test_block_format_roundtrip(rng):
    m = random_sparse(rng, 300, 260, 0.03)
    a = to_block_sparse(m, br=128, bc=128)
    # densify the block format and compare with the padded original
    dense = np.zeros(a.shape, np.float32)
    rp = np.asarray(a.row_ptr)
    cols = np.asarray(a.block_cols).reshape(-1)  # stored chunked 3-D
    blocks = np.asarray(a.blocks)
    for rt in range(len(rp) - 1):
        for k in range(rp[rt], rp[rt + 1]):
            dense[rt * a.br:(rt + 1) * a.br,
                  cols[k] * a.bc:(cols[k] + 1) * a.bc] = blocks[k]
    expect = np.zeros(a.shape, np.float32)
    expect[:300, :260] = m.toarray()
    np.testing.assert_array_equal(dense, expect)


def test_spmm_reference_matches_dense(rng):
    m = random_sparse(rng, 270, 250, 0.05)
    a = to_block_sparse(m, br=128, bc=128)
    x = rng.standard_normal((250, 64)).astype(np.float32)
    y = spmm_reference(a, jnp.asarray(x))
    expect = m.toarray() @ x
    np.testing.assert_allclose(np.asarray(y)[:270], expect, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("x_vmem", [True, False])
@pytest.mark.parametrize("shape,density", [((256, 256), 0.05),
                                           ((384, 640), 0.01),
                                           ((128, 128), 0.3)])
def test_spmm_pallas_interpret(rng, shape, density, x_vmem):
    """Both kernel families: VMEM-resident-x (batched block DMA) and the
    HBM-streaming pipeline."""
    m = random_sparse(rng, *shape, density)
    a = to_block_sparse(m, br=128, bc=128)
    x = rng.standard_normal((shape[1], 128)).astype(np.float32)
    y = spmm(a, jnp.asarray(x), interpret=True, x_vmem=x_vmem)
    expect = m.toarray() @ x
    np.testing.assert_allclose(np.asarray(y)[:shape[0]], expect,
                               rtol=1e-4, atol=1e-4)


def test_spmm_empty_row_tile(rng):
    """A row tile with no stored blocks must produce zeros."""
    m = sp.csr_matrix((np.ones(3, np.float32), ([0, 1, 2], [0, 5, 9])),
                      shape=(300, 200))  # rows 128..255 empty -> tile 1 empty
    a = to_block_sparse(m, br=128, bc=128)
    x = rng.standard_normal((200, 128)).astype(np.float32)
    for x_vmem in (True, False):
        y = np.asarray(spmm(a, jnp.asarray(x), interpret=True,
                            x_vmem=x_vmem))
        np.testing.assert_allclose(y[128:256], 0.0)
        np.testing.assert_allclose(y[:300], m.toarray() @ x,
                                   rtol=1e-4, atol=1e-4)


def test_block_format_guard_rejects_unstructured(rng):
    """Uniform-random sparsity (~1 nnz/tile) must be refused with guidance."""
    n = 4096
    nnz = 4000
    m = sp.csr_matrix((np.ones(nnz, np.float32),
                       (rng.integers(0, n, nnz), rng.integers(0, n, nnz))),
                      shape=(n, n))
    with pytest.raises(ValueError, match="clustered sparsity"):
        to_block_sparse(m, br=128, bc=128, max_bytes=1 << 20)


def test_degree_sort_improves_clustering(rng):
    from gdmcf_tpu.ops.spmm import degree_sort_permutation
    n_u, n_i, nnz = 1024, 1024, 8000
    pop = 1.0 / np.arange(1, n_i + 1) ** 1.2
    pop /= pop.sum()
    rows = rng.integers(0, n_u, nnz)
    cols = rng.choice(n_i, size=nnz, p=pop)
    m = sp.csr_matrix((np.ones(nnz, np.float32), (rows, cols)),
                      shape=(n_u, n_i))
    m.data[:] = 1.0
    rng2 = np.random.default_rng(1)
    shuffled = m[rng2.permutation(n_u)][:, rng2.permutation(n_i)].tocsr()

    def n_tiles(mat):
        from gdmcf_tpu.ops.spmm import n_real_blocks
        a = to_block_sparse(mat, br=128, bc=128, max_bytes=1 << 30)
        return n_real_blocks(a)

    rp, cp = degree_sort_permutation(shuffled)
    sorted_m = shuffled[rp][:, cp].tocsr()
    assert n_tiles(sorted_m) < n_tiles(shuffled)


@pytest.mark.parametrize("x_vmem", [True, False])
@pytest.mark.parametrize("br", [8, 16, 128])
def test_spmm_thin_row_tiles(rng, br, x_vmem):
    """br=8/16 tiles (f32 min sublane is 8) cut densification waste ~16x for
    power-law graphs; both kernel families are parametric in br."""
    m = random_sparse(rng, 384, 512, 0.03)
    a = to_block_sparse(m, br=br, bc=128)
    x = rng.standard_normal((512, 128)).astype(np.float32)
    y = spmm(a, jnp.asarray(x), interpret=True, x_vmem=x_vmem)
    np.testing.assert_allclose(np.asarray(y)[:384], m.toarray() @ x,
                               rtol=1e-4, atol=1e-4)


def test_duplicate_coo_entries_sum(rng):
    rows = np.array([0, 0, 3]); cols = np.array([5, 5, 7])
    m = sp.coo_matrix((np.ones(3, np.float32), (rows, cols)), shape=(128, 128))
    a = to_block_sparse(m, br=128, bc=128)
    x = np.eye(128, dtype=np.float32)
    y = np.asarray(spmm_reference(a, jnp.asarray(x)))
    assert y[0, 5] == 2.0  # duplicates summed, matching csr canonical form
    assert y[3, 7] == 1.0


# ---------------------------------------------------------------------------
# hybrid tile + COO remainder format
# ---------------------------------------------------------------------------

def test_hybrid_matches_dense(rng):
    import jax.numpy as jnp

    from gdmcf_tpu.ops.spmm import hybrid_arrays, hybrid_meta, hybrid_spmm, to_hybrid

    n_r, n_c, d = 60, 40, 8
    dense = np.where(rng.random((n_r, n_c)) < 0.15,
                     rng.standard_normal((n_r, n_c)), 0.0).astype(np.float32)
    h = to_hybrid(sp.csr_matrix(dense), br=8, bc=16, min_fill=20)
    assert h.rem_vals.shape[0] > 0          # some tiles went to COO...
    from gdmcf_tpu.ops.spmm import n_real_blocks
    assert n_real_blocks(h.tiles) > 1       # ...and some stayed dense
    x = rng.standard_normal((n_c, d)).astype(np.float32)
    y = np.asarray(hybrid_spmm(hybrid_meta(h), hybrid_arrays(h),
                               jnp.asarray(x), interpret=True))[:n_r]
    np.testing.assert_allclose(y, dense @ x, rtol=2e-4, atol=2e-5)
    # transpose direction
    xu = rng.standard_normal((n_r, d)).astype(np.float32)
    yt = np.asarray(hybrid_spmm(hybrid_meta(h), hybrid_arrays(h),
                                jnp.asarray(xu), transpose=True,
                                interpret=True))[:n_c]
    np.testing.assert_allclose(yt, dense.T @ xu, rtol=2e-4, atol=2e-5)


def test_hybrid_gradients_match_dense(rng):
    import jax
    import jax.numpy as jnp

    from gdmcf_tpu.ops.spmm import hybrid_arrays, hybrid_meta, hybrid_spmm, to_hybrid

    n_r, n_c, d = 40, 24, 4
    dense = np.where(rng.random((n_r, n_c)) < 0.2,
                     rng.standard_normal((n_r, n_c)), 0.0).astype(np.float32)
    h = to_hybrid(sp.csr_matrix(dense), br=8, bc=8, min_fill=2)
    meta, arrays = hybrid_meta(h), hybrid_arrays(h)
    w = rng.standard_normal((n_r, d)).astype(np.float32)
    x0 = jnp.asarray(rng.standard_normal((n_c, d)).astype(np.float32))

    def loss_h(x):
        return (hybrid_spmm(meta, arrays, x, interpret=True)[:n_r]
                * w).sum()

    def loss_d(x):
        return (jnp.asarray(dense) @ x * w).sum()

    g_h = np.asarray(jax.grad(loss_h)(x0))
    g_d = np.asarray(jax.grad(loss_d)(x0))
    np.testing.assert_allclose(g_h, g_d, rtol=2e-4, atol=2e-4)


def test_hybrid_all_tiles_kept_and_all_remainder(rng):
    """Degenerate splits: min_fill=1 (no remainder) and huge min_fill
    (everything COO) both reproduce the dense product."""
    import jax.numpy as jnp

    from gdmcf_tpu.ops.spmm import hybrid_arrays, hybrid_meta, hybrid_spmm, to_hybrid

    n_r, n_c, d = 24, 16, 4
    dense = np.where(rng.random((n_r, n_c)) < 0.3,
                     rng.standard_normal((n_r, n_c)), 0.0).astype(np.float32)
    x = rng.standard_normal((n_c, d)).astype(np.float32)
    for min_fill in (1, 10_000):
        h = to_hybrid(sp.csr_matrix(dense), br=8, bc=8, min_fill=min_fill)
        y = np.asarray(hybrid_spmm(hybrid_meta(h), hybrid_arrays(h),
                                   jnp.asarray(x), interpret=True))[:n_r]
        np.testing.assert_allclose(y, dense @ x, rtol=2e-4, atol=2e-5)


def test_spmm_transpose_matches_dense(rng):
    """A^T @ x via the CSC view over the SAME tiles (no transposed copy)."""
    import jax.numpy as jnp

    from gdmcf_tpu.ops.spmm import spmm, to_block_sparse

    n_r, n_c, d = 48, 32, 8
    dense = np.where(rng.random((n_r, n_c)) < 0.25,
                     rng.standard_normal((n_r, n_c)), 0.0).astype(np.float32)
    a = to_block_sparse(sp.csr_matrix(dense), br=8, bc=16)
    x = rng.standard_normal((n_r, d)).astype(np.float32)
    for x_vmem in (True, False):
        y = np.asarray(spmm(a, jnp.asarray(x), transpose=True,
                            interpret=True, x_vmem=x_vmem))[:n_c]
        np.testing.assert_allclose(y, dense.T @ x, rtol=2e-4, atol=2e-5)


def test_spmm_op_vjp_both_directions(rng):
    """grad through spmm_op forward AND transpose == dense grads."""
    import jax
    import jax.numpy as jnp

    from gdmcf_tpu.ops.spmm import (block_sparse_arrays, block_sparse_meta,
                                    spmm_op, to_block_sparse)

    n_r, n_c, d = 32, 24, 4
    dense = np.where(rng.random((n_r, n_c)) < 0.3,
                     rng.standard_normal((n_r, n_c)), 0.0).astype(np.float32)
    a = to_block_sparse(sp.csr_matrix(dense), br=8, bc=8)
    meta, arrays = block_sparse_meta(a), block_sparse_arrays(a)
    dj = jnp.asarray(dense)

    w_f = rng.standard_normal((n_r, d)).astype(np.float32)
    x_f = jnp.asarray(rng.standard_normal((n_c, d)).astype(np.float32))
    g_k = jax.grad(lambda x: (spmm_op(meta, False, True, arrays, x)[:n_r]
                              * w_f).sum())(x_f)
    g_d = jax.grad(lambda x: (dj @ x * w_f).sum())(x_f)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_d),
                               rtol=2e-4, atol=2e-4)

    w_t = rng.standard_normal((n_c, d)).astype(np.float32)
    x_t = jnp.asarray(rng.standard_normal((n_r, d)).astype(np.float32))
    g_kt = jax.grad(lambda x: (spmm_op(meta, True, True, arrays, x)[:n_c]
                               * w_t).sum())(x_t)
    g_dt = jax.grad(lambda x: (dj.T @ x * w_t).sum())(x_t)
    np.testing.assert_allclose(np.asarray(g_kt), np.asarray(g_dt),
                               rtol=2e-4, atol=2e-4)


def test_spmm_nonmultiple_d_padding(rng):
    """D not a multiple of 128: padded internally, sliced back."""
    import jax.numpy as jnp

    from gdmcf_tpu.ops.spmm import spmm, to_block_sparse

    n_r, n_c, d = 24, 16, 5
    dense = np.where(rng.random((n_r, n_c)) < 0.4,
                     rng.standard_normal((n_r, n_c)), 0.0).astype(np.float32)
    a = to_block_sparse(sp.csr_matrix(dense), br=8, bc=8)
    x = rng.standard_normal((n_c, d)).astype(np.float32)
    y = np.asarray(spmm(a, jnp.asarray(x), interpret=True))[:n_r]
    assert y.shape == (n_r, d)
    np.testing.assert_allclose(y, dense @ x, rtol=2e-4, atol=2e-5)
