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
                 steps=5, noise_scale=0.01, batch_size=B)
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
