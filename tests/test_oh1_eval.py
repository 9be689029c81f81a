"""OneHotMatrix=1 eval-wrapper oracle (round-3 parity finding).

Pins the block one-hot eval semantics (ref main.py:283-299): block
assembly, p_sample on the block, <=0.1 zeroing, upper-right extraction,
history mask, top-k. The scores themselves are produced by the (already
oracle-tested) p_sample; this test checks the WRAPPER around it matches a
straight numpy transcription of the reference. Comparison is tie-robust:
zero-score top-k positions are ties whose order even the reference leaves
undetermined (torch heap order — see docs/PARITY.md), so we compare the
score multisets at the returned ids, and the exact id lists on the live
(score > 0) prefix.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gdmcf_tpu.config import Config
from gdmcf_tpu.train.trainer import Trainer

N_USER, N_ITEM, B = 64, 48, 16


def test_oh1_eval_step_matches_numpy_oracle(rng):
    cfg = Config(backbone="DNN", dims=[32], emb_size=10, steps=5,
                 noise_scale=0.01, noise_min=0.001, noise_max=0.01,
                 OneHotMatrix=1, batch_size=B, mean_type="x0",
                 sampling_steps=0, fidelity=True, debug=True)
    trainer = Trainer(cfg, N_USER, N_ITEM)
    state = trainer.init_state()

    x = (rng.random((B, N_ITEM)) < 0.15).astype(np.float32)
    mask = x.copy()
    k = 12
    idx = trainer._eval_step(state.params, jnp.asarray(x),
                             jnp.arange(B, dtype=jnp.int32),
                             jnp.asarray(mask), jax.random.PRNGKey(0),
                             sampling_steps=0, top_k=k)
    idx = np.asarray(idx)

    # numpy oracle of the reference wrapper, fed by the same p_sample
    block = np.zeros((B + N_ITEM, B + N_ITEM), np.float32)
    block[:B, B:] = x
    scores = np.asarray(trainer.diffusion.p_sample(
        trainer.model.apply, state.params, jnp.asarray(block),
        jnp.arange(B + N_ITEM, dtype=jnp.int32), jax.random.PRNGKey(0),
        sampling_steps=0, sampling_noise=False))
    s = np.where(scores <= 0.1, 0.0, scores)[:B, B:]
    s[mask > 0] = -np.inf
    oracle_idx = np.argsort(-s, axis=1, kind="stable")[:, :k]

    got_vals = np.take_along_axis(s, idx, axis=1)
    want_vals = np.take_along_axis(s, oracle_idx, axis=1)
    # score multisets must match position-for-position after sorting (ties
    # may permute ids, never scores)
    np.testing.assert_allclose(np.sort(got_vals, axis=1),
                               np.sort(want_vals, axis=1), rtol=1e-6)
    # the live (score > 0) prefix must match exactly, ids included
    for u in range(B):
        live = want_vals[u] > 0
        np.testing.assert_array_equal(idx[u][: live.sum()],
                                      oracle_idx[u][: live.sum()])


def test_oh1_train_step_block_conversion(rng):
    """The train path block-onehots INSIDE the program: a pre-blocked input
    and a raw adjacency input produce identical losses."""
    cfg = Config(backbone="DNN", dims=[32], emb_size=10, steps=5,
                 noise_scale=0.01, noise_min=0.001, noise_max=0.01,
                 OneHotMatrix=1, batch_size=B, mean_type="x0",
                 sampling_steps=0, fidelity=True, debug=True,
                 wire_format="f32")
    trainer = Trainer(cfg, N_USER, N_ITEM)
    state = trainer.init_state()
    x = (rng.random((B, N_ITEM)) < 0.15).astype(np.float32)
    block = np.zeros((B + N_ITEM, B + N_ITEM), np.float32)
    block[:B, B:] = x
    idx = jnp.arange(B, dtype=jnp.int32)

    # _train_step donates the state; use two identical fresh states
    _, l_raw = trainer._train_step(state, jnp.asarray(x), idx)
    _, l_blk = trainer._train_step(trainer.init_state(), jnp.asarray(block),
                                   idx)
    np.testing.assert_allclose(float(l_raw), float(l_blk), rtol=1e-6)
