"""End-to-end smoke: synthetic dataset -> fit a few epochs -> sane metrics."""

import numpy as np

from gdmcf_tpu.config import Config
from gdmcf_tpu.data.loader import data_load, generate_synthetic_dataset
from gdmcf_tpu.train.trainer import Trainer


def test_fit_smoke(tmp_path):
    paths = generate_synthetic_dataset(str(tmp_path), n_user=60, n_item=48,
                                       avg_degree=10, seed=3)
    train, valid, test, n_user, n_item = data_load(*paths)
    cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[16], emb_size=10,
                 steps=5, noise_scale=0.01, batch_size=16, epochs=4,
                 eval_every=2, topN=[5, 10], lr=1e-3, debug=True,
                 sampling_steps=0)
    trainer = Trainer(cfg, n_user, n_item)
    logs = []
    state, best = trainer.fit(train, valid, test, log=logs.append)
    assert best is not None
    precision, recall, ndcg, mrr = best
    assert len(recall) == 2
    assert all(0.0 <= v <= 1.0 for v in recall + ndcg + mrr)
    assert int(state.step) == 4 * (60 // 16)


def test_loss_decreases(tmp_path):
    """Training on a strong signal should reduce the loss."""
    import jax
    import jax.numpy as jnp

    paths = generate_synthetic_dataset(str(tmp_path / "d2"), n_user=64,
                                       n_item=40, avg_degree=12, seed=4)
    train, valid, test, n_user, n_item = data_load(*paths)
    cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[16], emb_size=10,
                 steps=5, noise_scale=0.01, batch_size=32, lr=1e-2,
                 sampling_steps=0)
    trainer = Trainer(cfg, n_user, n_item)
    state = trainer.init_state()
    rows = jnp.asarray(np.asarray(train.todense(), dtype=np.float32)[:32])
    idx = jnp.arange(32, dtype=jnp.int32)
    losses = []
    for _ in range(30):
        state, loss = trainer._train_step(state, rows, idx)
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_onehotmatrix1_mode(tmp_path):
    """OneHotMatrix==1: [B,n] -> [B+n,B+n] block one-hot end-to-end
    (ref main.py:282-295,334-336)."""
    from gdmcf_tpu.data.loader import data_load, generate_synthetic_dataset
    paths = generate_synthetic_dataset(str(tmp_path / "oh1"), n_user=48,
                                       n_item=32, avg_degree=8, seed=5)
    train, valid, test, n_user, n_item = data_load(*paths)
    cfg = Config(backbone="DNN", OneHotMatrix=1, dims=[16], emb_size=10,
                 steps=5, noise_scale=0.01, batch_size=16, epochs=2,
                 eval_every=2, topN=[5, 10], lr=1e-3, debug=True,
                 sampling_steps=0)
    assert cfg.out_dims(n_item) == [16, n_item + 16]
    trainer = Trainer(cfg, n_user, n_item)
    logs = []
    state, best = trainer.fit(train, valid, test, log=logs.append)
    assert best is not None
    assert all(0.0 <= v <= 1.0 for v in best[1])


def test_host_dense_false_matches_dense_path(tmp_path):
    """The CSR-backed streaming fit produces the same metrics as the dense
    path (same seeds, same data)."""
    from gdmcf_tpu.data.loader import data_load, generate_synthetic_dataset
    paths = generate_synthetic_dataset(str(tmp_path / "hd"), n_user=64,
                                       n_item=48, avg_degree=10, seed=9)
    train, valid, test, n_user, n_item = data_load(*paths)

    def run(host_dense):
        cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[16], emb_size=10,
                     steps=5, noise_scale=0.01, batch_size=16, epochs=2,
                     eval_every=2, topN=[5, 10], lr=1e-3, debug=True,
                     sampling_steps=0, host_dense=host_dense)
        trainer = Trainer(cfg, n_user, n_item)
        logs = []
        _, best = trainer.fit(train, valid, test, log=logs.append)
        return best

    dense = run(True)
    streaming = run(False)
    for a, b in zip(dense, streaming):
        assert a == b


def test_eval_protocol_uses_train_rows_as_input(tmp_path):
    """The eval loader iterates TRAIN rows and masks them (ref main.py:156,
    296-299): a user's train items must never be recommended, and the
    prediction indices must come from unseen items."""
    import jax
    import jax.numpy as jnp
    from gdmcf_tpu.data.loader import data_load, generate_synthetic_dataset

    paths = generate_synthetic_dataset(str(tmp_path / "ep"), n_user=48,
                                       n_item=40, avg_degree=10, seed=11)
    train, valid, test, n_user, n_item = data_load(*paths)
    cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[16], emb_size=10,
                 steps=5, noise_scale=0.01, batch_size=16, topN=[5, 10],
                 sampling_steps=0)
    trainer = Trainer(cfg, n_user, n_item)
    state = trainer.init_state()
    rows = np.asarray(train.todense(), dtype=np.float32)[:16]
    idx = jnp.arange(16, dtype=jnp.int32)
    pred = trainer._eval_step(state.params, jnp.asarray(rows), idx,
                              jnp.asarray(rows), jax.random.PRNGKey(0),
                              sampling_steps=0, top_k=10)
    pred = np.asarray(pred)
    for u in range(16):
        assert not rows[u][pred[u]].any(), "train history leaked into top-k"


def test_tst_w_val_protocol(tmp_path):
    """tst_w_val=True evaluates test with train+valid as input and mask
    (ref main.py:174-177, 355-356)."""
    from gdmcf_tpu.data.loader import data_load, generate_synthetic_dataset
    paths = generate_synthetic_dataset(str(tmp_path / "twv"), n_user=48,
                                       n_item=32, avg_degree=8, seed=21)
    train, valid, test, n_user, n_item = data_load(*paths)
    cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[12], emb_size=10,
                 steps=5, noise_scale=0.01, batch_size=16, epochs=2,
                 eval_every=2, topN=[5], lr=1e-3, debug=True,
                 sampling_steps=0, tst_w_val=True)
    trainer = Trainer(cfg, n_user, n_item)
    logs = []
    state, best = trainer.fit(train, valid, test, log=logs.append)
    assert best is not None and all(0 <= v <= 1 for v in best[1])
    # streaming path agrees under tst_w_val too
    cfg2 = Config(**{**cfg.to_dict(), "host_dense": False})
    trainer2 = Trainer(cfg2, n_user, n_item)
    _, best2 = trainer2.fit(train, valid, test, log=logs.append)
    assert best == best2


def test_fused_multi_step_equals_sequential(tmp_path):
    """K fused optimizer steps (lax.scan) == K sequential steps, exactly."""
    import jax
    import jax.numpy as jnp

    paths = generate_synthetic_dataset(str(tmp_path / "ms"), n_user=64,
                                       n_item=32, avg_degree=8, seed=41)
    train, valid, test, n_user, n_item = data_load(*paths)
    cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[12], emb_size=10,
                 steps=5, noise_scale=0.01, batch_size=16, lr=1e-3,
                 sampling_steps=0)
    trainer = Trainer(cfg, n_user, n_item)
    rows = np.asarray(train.todense(), dtype=np.float32)
    xs = jnp.asarray(np.stack([rows[0:16], rows[16:32], rows[32:48]]))
    iis = jnp.stack([jnp.arange(0, 16), jnp.arange(16, 32),
                     jnp.arange(32, 48)]).astype(jnp.int32)

    s_seq = trainer.init_state()
    for i in range(3):
        s_seq, _ = trainer._train_step(s_seq, xs[i], iis[i])

    s_fused = trainer.init_state()
    s_fused, losses = trainer._train_multi(s_fused, xs, iis)
    assert losses.shape == (3,)
    assert int(s_fused.step) == int(s_seq.step) == 3
    for a, b in zip(jax.tree_util.tree_leaves(s_seq.params),
                    jax.tree_util.tree_leaves(s_fused.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_train_epoch_with_steps_per_call(tmp_path):
    """train_epoch with train_steps_per_call>1 covers all batches incl. the
    remainder and matches the single-step path's final step count."""
    paths = generate_synthetic_dataset(str(tmp_path / "ms2"), n_user=80,
                                       n_item=32, avg_degree=8, seed=42)
    train, valid, test, n_user, n_item = data_load(*paths)

    def run(k):
        cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[12], emb_size=10,
                     steps=5, noise_scale=0.01, batch_size=16, lr=1e-3,
                     sampling_steps=0, train_steps_per_call=k)
        trainer = Trainer(cfg, n_user, n_item)
        state = trainer.init_state()
        state, loss = trainer.train_epoch(
            state, __import__("gdmcf_tpu.data.loader", fromlist=["x"]
                              ).DiffusionDataset(train),
            np.random.default_rng(0))
        return int(state.step), loss

    steps1, loss1 = run(1)
    steps2, loss2 = run(2)  # 5 batches -> 2 fused pairs + 1 remainder
    assert steps1 == steps2 == 80 // 16
    np.testing.assert_allclose(loss1, loss2, rtol=1e-5)
