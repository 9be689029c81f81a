"""Checkpoint save -> restore -> bit-exact resume (SURVEY.md §4 item 5)."""

import jax
import jax.numpy as jnp
import numpy as np

from gdmcf_tpu.config import Config
from gdmcf_tpu.train.checkpoint import Checkpointer
from gdmcf_tpu.train.trainer import Trainer

N_USER, N_ITEM, B = 24, 20, 8


def make_trainer():
    cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[12], emb_size=10,
                 steps=5, noise_scale=0.01, batch_size=B, sampling_steps=0)
    return Trainer(cfg, N_USER, N_ITEM)


def test_checkpoint_roundtrip_bit_exact(tmp_path):
    trainer = make_trainer()
    state = trainer.init_state()
    x = (jax.random.uniform(jax.random.PRNGKey(1), (B, N_ITEM)) < 0.3
         ).astype(jnp.float32)
    idx = jnp.arange(B, dtype=jnp.int32)

    # advance a few steps, checkpoint, advance one more
    for _ in range(3):
        state, _ = trainer._train_step(state, x, idx)
    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    ckpt.save(state)

    state_a, loss_a = trainer._train_step(state, x, idx)

    # restore into a fresh template and take the same step
    template = jax.tree_util.tree_map(np.zeros_like, trainer.init_state())
    restored = ckpt.restore(template)
    assert int(restored.step) == 3
    state_b, loss_b = trainer._train_step(restored, x, idx)

    assert float(loss_a) == float(loss_b)
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ckpt.close()


def test_async_save_survives_donation(tmp_path):
    """save(block=False) must snapshot to host before returning: the next
    train step DONATES the state buffers (donate_argnums), so a lazy device
    read in the background writer would see freed memory. Restore must
    return the pre-donation values bit-exactly."""
    trainer = make_trainer()
    state = trainer.init_state()
    x = (jax.random.uniform(jax.random.PRNGKey(1), (B, N_ITEM)) < 0.3
         ).astype(jnp.float32)
    idx = jnp.arange(B, dtype=jnp.int32)
    for _ in range(2):
        state, _ = trainer._train_step(state, x, idx)
    snapshot = jax.tree_util.tree_map(np.array, state)

    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    ckpt.save(state, extra={"best_metric": 0.5}, block=False)
    # donate/overwrite the saved buffers while the write is in flight
    for _ in range(3):
        state, _ = trainer._train_step(state, x, idx)
    ckpt.wait()

    template = jax.tree_util.tree_map(np.zeros_like, trainer.init_state())
    restored = ckpt.restore(template)
    assert int(restored.step) == 2
    for a, b in zip(jax.tree_util.tree_leaves(snapshot),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ckpt.load_extra() == {"best_metric": 0.5}


def test_fit_resume_from_checkpoint(tmp_path):
    """fit() with ckpt_dir saves the best state; a second fit() with
    resume=True restores it and continues from the right epoch."""
    import scipy.sparse as sp

    rng = np.random.default_rng(0)
    n_user, n_item = 32, 24
    train = sp.csr_matrix((rng.random((n_user, n_item)) < 0.3).astype(np.float32))
    valid = sp.csr_matrix((rng.random((n_user, n_item)) < 0.1).astype(np.float32))
    test = sp.csr_matrix((rng.random((n_user, n_item)) < 0.1).astype(np.float32))

    def cfg(epochs):
        return Config(backbone="DNNOneHotEmbeddingGCN", dims=[12], emb_size=10,
                      steps=5, noise_scale=0.01, batch_size=8, epochs=epochs,
                      eval_every=2, topN=[5], lr=1e-3, debug=True,
                      sampling_steps=0, ckpt_dir=str(tmp_path / "ck"),
                      resume=True)

    t1 = Trainer(cfg(2), n_user, n_item)
    logs1 = []
    state1, best1 = t1.fit(train, valid, test, log=logs1.append)
    assert int(state1.step) == 2 * (n_user // 8)
    assert best1 is not None

    t2 = Trainer(cfg(4), n_user, n_item)
    logs2 = []
    state2, _ = t2.fit(train, valid, test, log=logs2.append)
    assert any("resumed from checkpoint" in l for l in logs2)
    # the resumed run keeps the restored step counter and adds exactly the
    # remaining 2 epochs (a from-scratch retrain would end at 2 epochs' steps)
    assert int(state2.step) == 4 * (n_user // 8)

    # a resume with NO remaining epochs (and hence no chance of a new best)
    # must still report the sidecar-restored best results, as the
    # uninterrupted run did — not None
    t3 = Trainer(cfg(2), n_user, n_item)
    _, best3 = t3.fit(train, valid, test, log=lambda *a: None)
    assert best3 is not None  # restored from the sidecar, not recomputed
    assert len(best3) == 4 and all(len(r) == 1 for r in best3)  # [P,R,N,M]@[5]


def test_periodic_checkpoint_resume_without_best(tmp_path):
    """ckpt_every saves into a separate periodic stream: a preemption on an
    eval plateau (no best checkpoint yet) must resume from it, with the
    step counter continued exactly."""
    import scipy.sparse as sp

    rng = np.random.default_rng(0)
    n_user, n_item = 32, 24
    mats = [sp.csr_matrix((rng.random((n_user, n_item)) < p
                           ).astype(np.float32)) for p in (0.3, 0.1, 0.1)]

    def cfg(epochs):
        return Config(backbone="DNN", dims=[8], emb_size=10, steps=3,
                      batch_size=8, topN=[5], sampling_steps=0,
                      epochs=epochs, eval_every=100,  # never evals
                      ckpt_dir=str(tmp_path / "ckpt"), resume=True,
                      ckpt_every=1, lr=1e-3, random_seed=3)

    t1 = Trainer(cfg(2), n_user, n_item)
    s1, _ = t1.fit(*mats, log=lambda *a: None)
    assert int(s1.step) == 2 * (n_user // 8)
    from gdmcf_tpu.train.checkpoint import Checkpointer
    # no best-eval checkpoint was ever written — only the periodic stream
    assert Checkpointer(str(tmp_path / "ckpt")).latest_step() is None
    per = Checkpointer(str(tmp_path / "ckpt" / "periodic"))
    assert per.latest_step() == 2 * (n_user // 8)

    logs = []
    t2 = Trainer(cfg(4), n_user, n_item)
    s2, _ = t2.fit(*mats, log=logs.append)
    assert any("resumed from checkpoint" in l for l in logs)
    assert int(s2.step) == 4 * (n_user // 8)


def test_blocking_save_flushes_prior_async_sidecar(tmp_path):
    """A block=True save (or close()) after an async save(extra=...) must
    flush the deferred sidecar, not overwrite it — dropping it resets
    best_metric to -100 on resume, the exact failure the sidecar
    machinery exists to prevent."""
    from gdmcf_tpu.config import Config
    from gdmcf_tpu.train.checkpoint import Checkpointer
    from gdmcf_tpu.train.trainer import Trainer

    t = Trainer(Config(backbone="DNN", dims=[8], emb_size=10, steps=3,
                       batch_size=4, sampling_steps=0), 8, 6)
    s = t.init_state()
    ck = Checkpointer(str(tmp_path / "a"))
    ck.save(s, step=1, extra={"best_metric": 0.5}, block=False)
    ck.save(s, step=2, block=True)  # no extra of its own
    assert ck.load_extra() == {"best_metric": 0.5}

    ck2 = Checkpointer(str(tmp_path / "b"))
    ck2.save(s, step=1, extra={"best_metric": 0.7}, block=False)
    ck2.close()  # close() must flush too
    assert ck2.load_extra() == {"best_metric": 0.7}
