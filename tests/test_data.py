"""Data layer: ingest, batching, synthetic generator, graph converters."""

import numpy as np
import pytest

from gdmcf_tpu.data.graph_convert import (
    adjacency_to_edge,
    adjacency_to_one_hot,
    edge_to_adjacency,
    one_hot_to_adjacency,
    pred_to_adjacency,
    set_top_k_to_one,
    topk_set,
)
from gdmcf_tpu.data.loader import (
    DiffusionDataset,
    data_load,
    epoch_batches,
    generate_synthetic_dataset,
)


@pytest.fixture(scope="module")
def synthetic(tmp_path_factory):
    out = tmp_path_factory.mktemp("data")
    paths = generate_synthetic_dataset(str(out), n_user=50, n_item=40,
                                       avg_degree=8, seed=1)
    return paths


def test_data_load_shapes(synthetic):
    train, valid, test, n_user, n_item = data_load(*synthetic)
    assert train.shape == (n_user, n_item) == valid.shape == test.shape
    assert train.nnz > 0 and valid.nnz > 0 and test.nnz > 0
    # splits are disjoint
    assert (train.multiply(valid)).nnz == 0
    assert (train.multiply(test)).nnz == 0


def test_dataset_and_batches(synthetic):
    train, _, _, n_user, n_item = data_load(*synthetic)
    ds = DiffusionDataset(train)
    assert len(ds) == n_user and ds.n_item == n_item
    rng = np.random.default_rng(0)
    batches = list(epoch_batches(ds, 16, rng, shuffle=True, drop_last=True))
    assert all(x.shape == (16, n_item) for x, _ in batches)
    assert len(batches) == n_user // 16
    # every batch row matches its claimed dataset row
    for x, idx in batches:
        np.testing.assert_array_equal(x, ds.rows[idx])
    # no shuffle, no drop_last covers all rows in order
    seq = list(epoch_batches(ds, 16, shuffle=False, drop_last=False))
    got = np.concatenate([i for _, i in seq])
    np.testing.assert_array_equal(got, np.arange(n_user))


def test_edge_roundtrip(rng):
    """adjacency -> edge -> adjacency is the identity (the check the reference
    left in comments, ref main.py:229-234)."""
    bs, a, b = 12, 30, 20
    x = (rng.random((bs, b)) < 0.3).astype(np.float32)
    index = rng.permutation(a)[:bs]
    edge = adjacency_to_edge(x, index, a=a)
    back = edge_to_adjacency(edge, index, a=a, b=b, bs=bs)
    np.testing.assert_array_equal(x, back)


def test_pred_filter(rng):
    bs, a, b = 6, 15, 10
    x = (rng.random((bs, b)) < 0.5).astype(np.float32)
    index = np.arange(bs)
    edge = adjacency_to_edge(x, index, a=a)
    pred = rng.integers(0, 2, edge.shape[1])
    filtered = pred_to_adjacency(edge, index, a=a, b=b, bs=bs, pred=pred)
    assert filtered.sum() == pred.sum()
    assert np.all(filtered <= x)


def test_one_hot_block_roundtrip(rng):
    a, b = 7, 9
    x = (rng.random((a, b)) < 0.4).astype(np.float32)
    y = adjacency_to_one_hot(a, b, x)
    assert y.shape == (a + b, a + b)
    assert y.sum() == x.sum()
    np.testing.assert_array_equal(one_hot_to_adjacency(a, b, y), x)


def test_topk_binarizers(rng):
    x = rng.random((5, 20))
    g = set_top_k_to_one(x, k=10)
    assert g.sum() == 10
    assert x.ravel()[g.ravel() == 1].min() >= np.sort(x.ravel())[-10]
    r = topk_set(x, k=3)
    assert r.sum() == 15
    np.testing.assert_array_equal(r.sum(axis=1), 3)


def test_ml100k_ingest_matches_reference_semantics(tmp_path):
    """load_ml100k mirrors ref lightGCN.py:13-49: rating>=3 filter, the exact
    sklearn split (random_state=16), train-fit LabelEncoder, test filtered to
    train-seen ids."""
    import pandas as pd
    from sklearn import preprocessing as pp
    from sklearn.model_selection import train_test_split

    from gdmcf_tpu.data.loader import generate_ml100k_csv, load_ml100k

    path = generate_ml100k_csv(str(tmp_path / "u.data"), n_user=60,
                               n_item=80, avg_degree=12, seed=3)
    train_csr, test_csr, n_users, n_items = load_ml100k(path)

    # independent replay of the reference's pandas pipeline
    df = pd.read_csv(path, sep="\t",
                     names=["user_id", "item_id", "rating", "timestamp"])
    df = df[df["rating"] >= 3]
    tr, te = train_test_split(df.values, test_size=0.2, random_state=16)
    tr = pd.DataFrame(tr, columns=df.columns)
    te = pd.DataFrame(te, columns=df.columns)
    le_u, le_i = pp.LabelEncoder(), pp.LabelEncoder()
    tr["u"] = le_u.fit_transform(tr["user_id"].values)
    tr["i"] = le_i.fit_transform(tr["item_id"].values)
    te = te[(te["user_id"].isin(tr["user_id"].unique()))
            & (te["item_id"].isin(tr["item_id"].unique()))]

    assert n_users == tr["u"].nunique()
    assert n_items == tr["i"].nunique()
    assert train_csr.shape == (n_users, n_items)
    assert train_csr.nnz == len(set(zip(tr["u"], tr["i"])))
    assert test_csr.nnz == len(
        set(zip(le_u.transform(te["user_id"].values),
                le_i.transform(te["item_id"].values))))
    # binary everywhere
    assert set(np.unique(train_csr.data)) == {1.0}


def test_data_load_empty_split_gives_empty_csr(tmp_path):
    """np.save of an empty list round-trips as shape (0,): data_load must
    produce an empty CSR for that split, not IndexError."""
    np.save(tmp_path / "train_list.npy",
            np.array([[0, 0], [1, 2]], dtype=np.int64))
    np.save(tmp_path / "valid_list.npy", np.array([], dtype=np.int64))
    np.save(tmp_path / "test_list.npy",
            np.array([[1, 1]], dtype=np.int64))
    from gdmcf_tpu.data.loader import data_load_dir
    tr, va, te, n_user, n_item = data_load_dir(str(tmp_path) + "/")
    assert (n_user, n_item) == (2, 3)
    assert va.nnz == 0 and va.shape == (2, 3)
    assert tr.nnz == 2 and te.nnz == 1


def test_top_k_zero_selects_nothing():
    """k=0 used to select EVERYTHING (idx[-0:] is the whole array)."""
    from gdmcf_tpu.data.graph_convert import (set_top_k_to_one,
                                              top_k_indices, topk_set)

    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    assert top_k_indices(x, 0).size == 0
    assert set_top_k_to_one(x, 0).sum() == 0
    assert topk_set(x, 0).sum() == 0
