"""Bit-packed wire format (ops/bitpack.py) and its trainer integration."""

import jax.numpy as jnp
import numpy as np
import pytest

from gdmcf_tpu.config import Config
from gdmcf_tpu.data.loader import DiffusionDataset, data_load, \
    generate_synthetic_dataset
from gdmcf_tpu.ops.bitpack import pack_rows, unpack_rows
from gdmcf_tpu.train.trainer import Trainer


@pytest.mark.parametrize("n", [8, 13, 128, 300])
def test_pack_unpack_roundtrip(n):
    rng = np.random.default_rng(0)
    x = (rng.random((7, n)) < 0.3).astype(np.float32)
    packed = pack_rows(x)
    assert packed.dtype == np.uint8
    assert packed.shape == (7, (n + 7) // 8)
    out = np.asarray(unpack_rows(jnp.asarray(packed), n))
    np.testing.assert_array_equal(out, x)


def test_binary_flags():
    import scipy.sparse as sp
    from gdmcf_tpu.data.native import NativeCSR

    m = sp.csr_matrix(np.array([[1.0, 0.0], [0.0, 1.0]]))
    assert DiffusionDataset(m).binary
    # duplicate edges sum to a count cell > 1 -> not packable
    dup = sp.csr_matrix((np.ones(3), ([0, 0, 1], [0, 0, 1])), shape=(2, 2))
    assert not DiffusionDataset(dup).binary
    assert NativeCSR.from_scipy(m).binary


def _run_epoch(tmp_path, wire_format, one_hot=2, k=1):
    paths = generate_synthetic_dataset(str(tmp_path / "d"), n_user=48,
                                       n_item=30, avg_degree=8, seed=3)
    train, _, _, n_user, n_item = data_load(*paths)
    # OneHotMatrix==1 (block-matrix mode) pairs with the plain DNN backbone
    # (the reference's CatOneHot channel is OneHotMatrix==2)
    backbone = "DNNOneHotEmbeddingGCN" if one_hot == 2 else "DNN"
    cfg = Config(backbone=backbone, dims=[16], emb_size=10,
                 steps=5, noise_scale=0.01, batch_size=16, lr=1e-2,
                 sampling_steps=0, wire_format=wire_format,
                 OneHotMatrix=one_hot, train_steps_per_call=k)
    trainer = Trainer(cfg, n_user, n_item)
    state = trainer.init_state()
    ds = DiffusionDataset(train)
    state, loss = trainer.train_epoch(state, ds, np.random.default_rng(11))
    return trainer, state, loss


@pytest.mark.parametrize("one_hot,k", [(2, 1), (2, 3), (1, 1)])
def test_packed_wire_matches_f32(tmp_path, one_hot, k):
    """Packed and f32 wire formats are the same math: after one epoch the
    losses agree and the params agree to float-ulp scale (the unpack is
    exact; the residual drift is XLA fusing/reassociating the packed
    program differently, ~1e-7 per step, which Adam's per-step
    normalization amplifies over longer horizons)."""
    _, s_f32, l_f32 = _run_epoch(tmp_path / "a", "f32", one_hot, k)
    _, s_pkd, l_pkd = _run_epoch(tmp_path / "b", "packed", one_hot, k)
    assert l_f32 == pytest.approx(l_pkd, rel=1e-6)
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(s_f32.params),
                    jax.tree_util.tree_leaves(s_pkd.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_nonbinary_dataset_falls_back(tmp_path):
    """A count-valued dataset must ride the f32 wire even when the config
    asks for packed (the packed format would silently binarize it)."""
    import scipy.sparse as sp

    rows = np.repeat(np.arange(16), 3)          # 3 edges per user...
    cols = np.tile(np.arange(3), 16)
    cols[0] = cols[1] = 0                       # ...user 0 repeats item 0
    dup = sp.csr_matrix((np.ones(48), (rows, cols)), shape=(16, 30))
    ds = DiffusionDataset(dup)
    assert not ds.binary
    cfg = Config(backbone="DNN", dims=[8], emb_size=10, steps=5,
                 batch_size=8, sampling_steps=0, wire_format="packed")
    trainer = Trainer(cfg, 16, 30)
    state = trainer.init_state()
    state, loss = trainer.train_epoch(state, ds, np.random.default_rng(0))
    assert np.isfinite(loss)


def test_bad_wire_format_rejected():
    with pytest.raises(ValueError, match="wire_format"):
        Config(wire_format="int4")


def test_fractional_dataset_not_binary():
    """Weighted matrices (values in (0,1)) must NOT be declared packable —
    pack_rows(x != 0) would silently binarize them."""
    import scipy.sparse as sp

    m = sp.csr_matrix(np.array([[0.5, 0.0], [0.0, 1.0]], dtype=np.float32))
    assert not DiffusionDataset(m).binary
    assert not DiffusionDataset.from_rows(
        np.array([[0.5, 1.0]], dtype=np.float32)).binary
    assert DiffusionDataset.from_rows(
        np.array([[0.0, 1.0]], dtype=np.float32)).binary


def test_fit_path_actually_packs(tmp_path):
    """Regression: fit() builds its dataset without the CSR constructor; the
    packed wire format must still engage there (the .binary flag was once
    left unset by __new__, silently disabling packing for all CLI runs)."""
    paths = generate_synthetic_dataset(str(tmp_path / "d"), n_user=48,
                                       n_item=30, avg_degree=8, seed=3)
    train, valid, test, n_user, n_item = data_load(*paths)
    cfg = Config(backbone="DNN", dims=[16], emb_size=10, steps=5,
                 batch_size=16, lr=1e-3, sampling_steps=0, epochs=1,
                 eval_every=5)
    trainer = Trainer(cfg, n_user, n_item)
    seen = []
    orig = trainer._train_step

    def spy(state, x, idx):
        seen.append(x.dtype)
        return orig(state, x, idx)

    trainer._train_step = spy
    trainer.fit(train, valid, test, log=lambda *a, **k: None)
    assert seen and all(d == np.uint8 for d in seen)


def test_uint8_wrong_width_rejected():
    """Genuine uint8 dense rows must fail loudly, not be reinterpreted as
    bit-flags (in-band dtype dispatch needs the shape to agree)."""
    cfg = Config(backbone="DNN", dims=[8], emb_size=10, steps=5,
                 batch_size=4, sampling_steps=0)
    trainer = Trainer(cfg, 16, 30)
    state = trainer.init_state()
    x = np.zeros((4, 30), dtype=np.uint8)  # dense binary, NOT packed
    with pytest.raises(ValueError, match="bit-packed wire format"):
        trainer._train_step(state, jnp.asarray(x),
                            jnp.arange(4, dtype=jnp.int32))


def test_serve_packed_matches_f32(tmp_path):
    """recommend() must return identical top-k under both wire formats."""
    from gdmcf_tpu.serve import Recommender

    paths = generate_synthetic_dataset(str(tmp_path / "d"), n_user=40,
                                       n_item=32, avg_degree=6, seed=5)
    train, _, _, n_user, n_item = data_load(*paths)
    outs = {}
    for wf in ("f32", "packed"):
        cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[16], emb_size=10,
                     steps=5, batch_size=8, sampling_steps=0,
                     sampling_noise=False, wire_format=wf)
        trainer = Trainer(cfg, n_user, n_item)
        state = trainer.init_state()
        rec = Recommender.from_state(trainer, state, train, serve_batch=8)
        items, _ = rec.recommend([0, 1, 2, 3], k=5)
        outs[wf] = items
    np.testing.assert_array_equal(outs["f32"], outs["packed"])
