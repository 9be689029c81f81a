"""Native C++ data engine vs numpy fallback (and scipy ground truth)."""

import numpy as np
import pytest
import scipy.sparse as sp

from gdmcf_tpu.data import native
from gdmcf_tpu.data.native import NativeCSR


def random_edges(rng, n_user, n_item, nnz):
    edges = np.stack([rng.integers(0, n_user, nnz),
                      rng.integers(0, n_item, nnz)], axis=1)
    return np.unique(edges, axis=0)


def test_native_library_compiles():
    native._ensure_lib()
    assert native.HAVE_NATIVE, "g++ toolchain present; native build must work"


def test_build_csr_matches_scipy(rng):
    n_user, n_item = 50, 40
    edges = random_edges(rng, n_user, n_item, 400)
    csr = NativeCSR.from_edge_list(edges, n_user, n_item)
    ref = sp.csr_matrix((np.ones(len(edges)), (edges[:, 0], edges[:, 1])),
                        shape=(n_user, n_item))
    np.testing.assert_array_equal(csr.indptr, ref.indptr)
    np.testing.assert_array_equal(csr.indices, ref.indices)  # both canonical per-row-sorted CSRs: exact, row-association preserved
    # per-row sorted
    for u in range(n_user):
        row = csr.indices[csr.indptr[u]:csr.indptr[u + 1]]
        assert np.all(np.diff(row) > 0)


def test_assemble_batch_matches_dense(rng):
    n_user, n_item = 60, 45
    edges = random_edges(rng, n_user, n_item, 500)
    csr = NativeCSR.from_edge_list(edges, n_user, n_item)
    dense = np.zeros((n_user, n_item), np.float32)
    dense[edges[:, 0], edges[:, 1]] = 1.0
    rows = rng.permutation(n_user)[:16]
    batch = csr.gather(rows)
    np.testing.assert_array_equal(batch, dense[rows])


def test_sample_bpr_validity_and_determinism(rng):
    n_user, n_item = 40, 30
    edges = random_edges(rng, n_user, n_item, 300)
    csr = NativeCSR.from_edge_list(edges, n_user, n_item)
    dense = np.zeros((n_user, n_item), np.float32)
    dense[edges[:, 0], edges[:, 1]] = 1.0
    users = rng.integers(0, n_user, 64).astype(np.int32)
    pos, neg = csr.sample_bpr(users, seed=42)
    pos2, neg2 = csr.sample_bpr(users, seed=42)
    np.testing.assert_array_equal(pos, pos2)
    np.testing.assert_array_equal(neg, neg2)
    for u, p, n in zip(users, pos, neg):
        if dense[u].sum() > 0:
            assert dense[u, p] == 1.0
            assert dense[u, n] == 0.0


def test_from_scipy_and_epoch_batches(rng):
    from gdmcf_tpu.data.loader import epoch_batches
    n_user, n_item = 33, 20
    edges = random_edges(rng, n_user, n_item, 150)
    ref = sp.csr_matrix((np.ones(len(edges)), (edges[:, 0], edges[:, 1])),
                        shape=(n_user, n_item))
    csr = NativeCSR.from_scipy(ref)
    assert csr.n_item == n_item
    batches = list(epoch_batches(csr, 8, np.random.default_rng(0)))
    assert all(x.shape == (8, n_item) for x, _ in batches)
    dense = ref.toarray()
    for x, idx in batches:
        np.testing.assert_array_equal(x, dense[idx])


@pytest.mark.parametrize("n_item", [30, 64, 131])
def test_gather_packed_matches_pack_of_gather(rng, monkeypatch, n_item):
    """C++ packed assembly == packbits(dense gather) == numpy fallback,
    at n_item both multiple and non-multiple of 8."""
    from gdmcf_tpu.ops.bitpack import pack_rows

    n_user = 40
    edges = random_edges(rng, n_user, n_item, 8 * n_item)
    csr = NativeCSR.from_edge_list(edges, n_user, n_item)
    rows = rng.permutation(n_user)[:8].astype(np.int32)
    expected = pack_rows(csr.gather(rows))
    np.testing.assert_array_equal(csr.gather_packed(rows), expected)

    monkeypatch.setattr(native, "_ensure_lib", lambda: None)
    np.testing.assert_array_equal(csr.gather_packed(rows), expected)


def test_numpy_fallback_matches_native(rng, monkeypatch):
    """The pure-numpy fallback path must agree with the C++ engine."""
    n_user, n_item = 40, 30
    edges = random_edges(rng, n_user, n_item, 300)
    native_csr = NativeCSR.from_edge_list(edges, n_user, n_item)
    rows = rng.permutation(n_user)[:8].astype(np.int32)
    batch_native = native_csr.gather(rows)
    users = rng.integers(0, n_user, 16).astype(np.int32)
    pos_n, neg_n = native_csr.sample_bpr(users, seed=7)

    monkeypatch.setattr(native, "_ensure_lib", lambda: None)
    fallback_csr = NativeCSR.from_edge_list(edges, n_user, n_item)
    np.testing.assert_array_equal(fallback_csr.indptr, native_csr.indptr)
    np.testing.assert_array_equal(fallback_csr.indices, native_csr.indices)
    batch_fb = fallback_csr.gather(rows)
    np.testing.assert_array_equal(batch_fb, batch_native)
    # BPR fallback: validity (RNG differs from the C++ splitmix64 stream)
    pos_f, neg_f = fallback_csr.sample_bpr(users, seed=7)
    dense = np.zeros((n_user, n_item), np.float32)
    dense[edges[:, 0], edges[:, 1]] = 1.0
    for u, p, n in zip(users, pos_f, neg_f):
        if dense[u].sum() > 0:
            assert dense[u, p] == 1.0 and dense[u, n] == 0.0


def test_sample_bpr_full_row_user_raises():
    """A user whose row covers the whole catalog has no negatives — the
    rejection loop (C++ AND numpy fallback) would spin forever; both entry
    points must refuse loudly instead."""
    import pytest
    import scipy.sparse as sp
    from gdmcf_tpu.data.native import NativeCSR
    from gdmcf_tpu.models.lightgcn import sample_bpr_batch

    full = sp.csr_matrix(np.ones((3, 4), dtype=np.float32))
    with pytest.raises(ValueError, match="all 4 items"):
        NativeCSR.from_scipy(full).sample_bpr(np.arange(3), seed=0)
    with pytest.raises(ValueError, match="all 4 items"):
        sample_bpr_batch(np.random.default_rng(0), full, 2)


def test_from_scipy_strict_rejects_counts_and_drops_explicit_zeros():
    """NativeCSR is structure-only: count cells must be rejected under the
    default strict mode (the dense path keeps values), membership callers
    opt in via strict=False, and a stored explicit 0.0 must never gather
    as 1.0."""
    import pytest
    import scipy.sparse as sp
    from gdmcf_tpu.data.native import NativeCSR

    counts = sp.csr_matrix(np.array([[0, 2, 0], [1, 0, 1]], np.float32))
    with pytest.raises(ValueError, match="structure-only"):
        NativeCSR.from_scipy(counts)
    ncsr = NativeCSR.from_scipy(counts, strict=False)
    np.testing.assert_array_equal(ncsr.gather(np.array([0, 1])),
                                  [[0, 1, 0], [1, 0, 1]])

    ez = sp.csr_matrix((np.array([0.0, 1.0], np.float32),
                        (np.array([0, 0]), np.array([1, 2]))), shape=(1, 3))
    assert ez.nnz == 2  # the explicit zero IS stored
    np.testing.assert_array_equal(
        NativeCSR.from_scipy(ez).gather(np.array([0])), [[0, 0, 1]])
