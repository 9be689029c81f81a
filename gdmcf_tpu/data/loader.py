"""Data ingest and batching.

Host-side: ``.npy`` edge lists -> scipy CSR user x item matrices, with
n_user/n_item inferred from max train ids — semantics of the reference
``data_load`` (``/root/reference/data_utils.py:164-213``). Device-side batches
are dense float32 rows ``(x [B, n_item], index [B])``, mirroring
``DataDiffusion.__getitem__`` (ref data_utils.py:222-224) which returns the
interaction row plus its user index.

The reference's shipped datasets are placeholder archives, so a synthetic
generator with a power-law item popularity is provided for development and
benchmarking (SURVEY.md §2 caveat 3).
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

import numpy as np
import scipy.sparse as sp


def data_load(train_path: str, valid_path: str, test_path: str):
    """Edge-list .npy triples -> (train_csr, valid_csr, test_csr, n_user, n_item).

    n_user/n_item come from the max ids in the *train* list (ref
    data_utils.py:169-183). Valid/test ids outside that range are rejected with
    a clear error instead of the reference's silent scipy failure.
    """
    train_list = np.load(train_path, allow_pickle=True)
    valid_list = np.load(valid_path, allow_pickle=True)
    test_list = np.load(test_path, allow_pickle=True)

    def as_edges(a, name):
        a = np.asarray(a, dtype=np.int64)
        if a.size == 0:
            # np.save of an empty list round-trips as shape (0,): normalize
            # so the [:, 0] indexing below gives an empty CSR, not IndexError
            return a.reshape(0, 2)
        if a.ndim != 2 or a.shape[1] != 2:
            raise ValueError(f"{name} list must be [nnz, 2] (uid, iid) "
                             f"pairs, got shape {a.shape}")
        return a

    train_list = as_edges(train_list, "train")
    valid_list = as_edges(valid_list, "valid")
    test_list = as_edges(test_list, "test")
    if len(train_list) == 0:
        raise ValueError("train list is empty — cannot infer n_user/n_item")

    n_user = int(train_list[:, 0].max()) + 1
    n_item = int(train_list[:, 1].max()) + 1

    for name, arr in (("valid", valid_list), ("test", test_list)):
        if len(arr) and (arr[:, 0].max() >= n_user or arr[:, 1].max() >= n_item):
            raise ValueError(
                f"{name} list contains ids outside the train-inferred "
                f"({n_user}, {n_item}) grid")

    def to_csr(lst):
        return sp.csr_matrix(
            (np.ones(len(lst), dtype=np.float64), (lst[:, 0], lst[:, 1])),
            shape=(n_user, n_item))

    return to_csr(train_list), to_csr(valid_list), to_csr(test_list), n_user, n_item


def data_load_dir(data_path: str):
    """:func:`data_load` over the standard ``{train,valid,test}_list.npy``
    triple under ``data_path`` (the reference's dataset layout)."""
    return data_load(os.path.join(data_path, "train_list.npy"),
                     os.path.join(data_path, "valid_list.npy"),
                     os.path.join(data_path, "test_list.npy"))


class DiffusionDataset:
    """Dense-row view over a CSR interaction matrix with user indices."""

    def __init__(self, csr: sp.spmatrix, n_rows: Optional[int] = None):
        if n_rows is not None:
            csr = csr[:n_rows]  # slice BEFORE densifying (n_user_cap exists
            #                     precisely for memory-constrained runs)
        # astype BEFORE densifying: toarray() on the f64 CSR would
        # materialize a double-width dense first (2x peak host memory)
        mat = csr.astype(np.float32).toarray()
        self.rows = np.ascontiguousarray(mat)
        # duplicate (uid, iid) pairs sum to count cells > 1 (the reference's
        # CSR build does the same), and weighted matrices have fractional
        # cells; only EXACTLY-0/1 rows may ride the bit-packed wire format
        from gdmcf_tpu.ops.bitpack import is_binary
        self.binary = is_binary(mat)

    @classmethod
    def from_rows(cls, rows: np.ndarray) -> "DiffusionDataset":
        """Wrap an already-dense row matrix (no CSR densification)."""
        from gdmcf_tpu.ops.bitpack import is_binary
        self = cls.__new__(cls)
        self.rows = np.ascontiguousarray(rows, dtype=np.float32)
        self.binary = is_binary(self.rows)
        return self

    def __len__(self) -> int:
        return self.rows.shape[0]

    @property
    def n_item(self) -> int:
        return self.rows.shape[1]

    def gather(self, idx: np.ndarray) -> np.ndarray:
        return self.rows[idx]

    def gather_packed(self, idx: np.ndarray) -> np.ndarray:
        """Bit-packed batch (ops/bitpack wire format); binary rows only."""
        from gdmcf_tpu.ops.bitpack import pack_rows
        return pack_rows(self.rows[idx])


class RowSlice:
    """A contiguous row-range view over any dataset (DiffusionDataset or
    NativeCSR): this is a process's local shard for multi-host training.
    ``offset`` maps slice positions back to global user ids."""

    def __init__(self, dataset, rows: range):
        self.dataset = dataset
        self.offset = rows.start
        self._len = len(rows)
        self.binary = getattr(dataset, "binary", False)

    def __len__(self) -> int:
        return self._len

    def gather(self, idx: np.ndarray) -> np.ndarray:
        return self.dataset.gather(np.asarray(idx) + self.offset)

    def gather_packed(self, idx: np.ndarray) -> np.ndarray:
        g = getattr(self.dataset, "gather_packed", None)
        if g is None:
            from gdmcf_tpu.ops.bitpack import pack_rows
            return pack_rows(self.gather(idx))
        return g(np.asarray(idx) + self.offset)


def epoch_stop(n: int, batch_size: int, drop_last: bool) -> int:
    """Row count an epoch iterates (the ONE place for the drop-last rule —
    trainer eval paths share it; three hand-copies once risked drift).

    drop_last trims to full batches, EXCEPT the degenerate case where the
    dataset is smaller than one batch: the reference's drop_last would
    train/eval on nothing and then crash — serve the single partial batch
    instead."""
    stop = (n // batch_size) * batch_size if drop_last else n
    if stop == 0 and n > 0:
        stop = n
    return stop


def epoch_batches(
    dataset: DiffusionDataset,
    batch_size: int,
    rng: Optional[np.random.Generator] = None,
    shuffle: bool = True,
    drop_last: bool = True,
    packed: bool = False,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield (x [B, n_item] float32, index [B] int32) batches.

    shuffle/drop_last mirror the reference DataLoader settings
    (ref main.py:155-156). Indices are the dataset row positions — the user
    ids the embedding table is keyed by. With ``packed`` (binary datasets
    only), x is the bit-packed uint8 wire format instead — assembled
    directly as bits when the dataset supports it (NativeCSR's C++ path
    skips the dense f32 staging buffer entirely).
    """
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        if rng is None:
            rng = np.random.default_rng()
        rng.shuffle(order)
    stop = epoch_stop(n, batch_size, drop_last)
    if packed:
        gather = getattr(dataset, "gather_packed", None)
        if gather is None:
            from gdmcf_tpu.ops.bitpack import pack_rows
            gather = lambda idx: pack_rows(dataset.gather(idx))  # noqa: E731
    else:
        gather = dataset.gather
    for start in range(0, stop, batch_size):
        idx = order[start:start + batch_size]
        yield gather(idx), idx.astype(np.int32)


def generate_synthetic_dataset(
    out_dir: str,
    n_user: int = 6000,
    n_item: int = 2800,
    avg_degree: int = 12,
    valid_frac: float = 0.1,
    test_frac: float = 0.2,
    seed: int = 0,
    alpha: float = 1.2,
) -> Tuple[str, str, str]:
    """Write train/valid/test_list.npy edge lists with power-law popularity.

    Every user receives >= 3 interactions so each split is non-degenerate.
    Returns the three file paths.
    """
    rng = np.random.default_rng(seed)
    pop = 1.0 / np.arange(1, n_item + 1) ** alpha
    pop /= pop.sum()

    edges = []
    for u in range(n_user):
        deg = max(3, rng.poisson(avg_degree))
        items = rng.choice(n_item, size=min(deg, n_item), replace=False, p=pop)
        for i in items:
            edges.append((u, int(i)))
    edges = np.array(edges, dtype=np.int64)
    rng.shuffle(edges)

    # per-user split so valid/test ground truth is non-empty for most users
    train, valid, test = [], [], []
    by_user: dict = {}
    for u, i in edges:
        by_user.setdefault(u, []).append(i)
    for u, items in by_user.items():
        items = np.array(items)
        n = len(items)
        n_test = max(1, int(n * test_frac))
        n_valid = max(1, int(n * valid_frac))
        test.extend((u, i) for i in items[:n_test])
        valid.extend((u, i) for i in items[n_test:n_test + n_valid])
        train.extend((u, i) for i in items[n_test + n_valid:])

    # n_user/n_item are inferred from the TRAIN max ids at load time
    # (data_load above, mirroring the reference). Move one edge of every
    # item/user that only occurs in valid/test into train so the inferred
    # grid covers all ids.
    train_items = {i for _, i in train}
    train_users = {u for u, _ in train}
    for split in (valid, test):
        kept = []
        for u, i in split:
            if i not in train_items or u not in train_users:
                train.append((u, i))
                train_items.add(i)
                train_users.add(u)
            else:
                kept.append((u, i))
        split[:] = kept

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for name, lst in (("train", train), ("valid", valid), ("test", test)):
        path = os.path.join(out_dir, f"{name}_list.npy")
        np.save(path, np.array(lst, dtype=np.int64))
        paths.append(path)
    return tuple(paths)

def generate_ml100k_csv(path: str, n_user: int = 400, n_item: int = 600,
                        avg_degree: int = 40, seed: int = 0,
                        alpha: float = 1.1) -> str:
    """Write a synthetic ml-100k-shaped ``u.data`` TSV (user_id, item_id,
    rating 1-5, timestamp) — the input shape of the reference LightGCN
    pretrainer's ingest (ref lightGCN.py:13-14). Raw ids start at 1 and are
    sparse (not contiguous) so the LabelEncoder step is actually exercised.
    """
    rng = np.random.default_rng(seed)
    pop = 1.0 / np.arange(1, n_item + 1) ** alpha
    pop /= pop.sum()
    # sparse raw id spaces: skip ~20% of ids
    user_ids = np.sort(rng.choice(n_user * 5, n_user, replace=False)) + 1
    item_ids = np.sort(rng.choice(n_item * 5, n_item, replace=False)) + 1
    rows = []
    for u in user_ids:
        deg = max(5, rng.poisson(avg_degree))
        items = rng.choice(n_item, size=min(deg, n_item), replace=False,
                           p=pop)
        for i in items:
            rating = int(rng.integers(1, 6))
            ts = int(rng.integers(874_000_000, 893_000_000))
            rows.append((int(u), int(item_ids[i]), rating, ts))
    rng.shuffle(rows)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        for r in rows:
            fh.write("\t".join(str(v) for v in r) + "\n")
    return path


def load_ml100k(path: str, min_rating: int = 3, test_size: float = 0.2,
                random_state: int = 16):
    """ml-100k ``u.data`` ingest with the reference LightGCN pretrainer's
    exact semantics (ref lightGCN.py:13-49):

      * keep ratings >= 3 (ref :18);
      * sklearn ``train_test_split(test_size=0.2, random_state=16)`` on the
        raw rows (ref :22) — the same library call so the split is
        bit-identical;
      * LabelEncoder fit on TRAIN user/item ids (ref :29-32);
      * test filtered to users AND items seen in train (ref :38);
      * n_users/n_items = train nunique (ref :44-45).

    Returns (train_csr [n_users, n_items], test_csr, n_users, n_items);
    interactions are binary (rating value discarded after the filter, as in
    the reference's dok assembly, ref :74-76 / :146-148).
    """
    import pandas as pd
    from sklearn import preprocessing as pp
    from sklearn.model_selection import train_test_split

    columns = ["user_id", "item_id", "rating", "timestamp"]
    df = pd.read_csv(path, sep="\t", names=columns)
    df = df[df["rating"] >= min_rating]
    train, test = train_test_split(df.values, test_size=test_size,
                                   random_state=random_state)
    train = pd.DataFrame(train, columns=df.columns)
    test = pd.DataFrame(test, columns=df.columns)

    le_user = pp.LabelEncoder()
    le_item = pp.LabelEncoder()
    train["user_id_idx"] = le_user.fit_transform(train["user_id"].values)
    train["item_id_idx"] = le_item.fit_transform(train["item_id"].values)
    train_user_ids = train["user_id"].unique()
    train_item_ids = train["item_id"].unique()
    test = test[(test["user_id"].isin(train_user_ids))
                & (test["item_id"].isin(train_item_ids))]
    test = test.copy()
    test["user_id_idx"] = le_user.transform(test["user_id"].values)
    test["item_id_idx"] = le_item.transform(test["item_id"].values)

    n_users = train["user_id_idx"].nunique()
    n_items = train["item_id_idx"].nunique()

    def to_csr(frame):
        data = np.ones(len(frame), dtype=np.float32)
        m = sp.coo_matrix(
            (data, (frame["user_id_idx"].values.astype(np.int64),
                    frame["item_id_idx"].values.astype(np.int64))),
            shape=(n_users, n_items)).tocsr()
        m.data[:] = 1.0  # collapse duplicate pairs to binary
        return m

    return to_csr(train), to_csr(test), n_users, n_items
