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


def test_gt_device_cache_keys_on_identity(rng):
    """The device GT cache must never serve a STALE entry: a different gt
    matrix of identical shape (same eval rows/mask) must produce different
    metrics, and re-evaluating with the first matrix must reproduce its
    result (cache hit correctness)."""
    cfg = Config(backbone="DNN", dims=[16], emb_size=10, steps=5,
                 noise_scale=0.01, batch_size=16, sampling_steps=0,
                 debug=True)
    trainer = Trainer(cfg, N_USER, N_ITEM)
    state = trainer.init_state()
    rows = (rng.random((N_USER, N_ITEM)) < 0.2).astype(np.float32)
    mask = rows
    gt_a = (rng.random((N_USER, N_ITEM)) < 0.1).astype(np.float32)
    gt_b = (rng.random((N_USER, N_ITEM)) < 0.1).astype(np.float32)
    topn = [5, 10]
    res_a = trainer.evaluate(state, rows, gt_a, mask, topn)
    res_b = trainer.evaluate(state, rows, gt_b, mask, topn)
    assert res_a != res_b  # stale cache would make these equal
    res_a2 = trainer.evaluate(state, rows, gt_a, mask, topn)
    assert res_a == res_a2


def test_device_metric_path_equals_host_oracle(rng):
    """The device-sums eval result equals compute_topn_accuracy run on the
    host over the same rankings (the pre-round-3 path)."""
    from gdmcf_tpu.ops.metrics import compute_topn_accuracy

    cfg = Config(backbone="DNN", dims=[16], emb_size=10, steps=5,
                 noise_scale=0.01, batch_size=16, sampling_steps=0,
                 debug=True, drop_last=False)
    trainer = Trainer(cfg, N_USER, N_ITEM)
    state = trainer.init_state()
    rows = (rng.random((N_USER, N_ITEM)) < 0.2).astype(np.float32)
    gt = (rng.random((N_USER, N_ITEM)) < 0.1).astype(np.float32)
    topn = [5, 10]
    res = trainer.evaluate(state, rows, gt, rows, topn)

    # host oracle: same batches, same keys, same rankings
    key = jax.random.PRNGKey(cfg.random_seed + 12345)
    idxs = []
    for start in range(0, N_USER, cfg.batch_size):
        x = rows[start:start + cfg.batch_size]
        m = x
        key, sub = jax.random.split(key)
        idx = trainer._eval_step(state.params, jnp.asarray(x),
                                 jnp.arange(start, start + x.shape[0],
                                            dtype=jnp.int32),
                                 jnp.asarray(m), sub, sampling_steps=0,
                                 top_k=10)
        idxs.append(np.asarray(idx))
    oracle = compute_topn_accuracy(gt, np.concatenate(idxs, axis=0), topn)
    assert res == oracle
