"""Diffusion engine: losses, Lt importance state, reverse sampler."""

import jax
import jax.numpy as jnp
import numpy as np

from gdmcf_tpu.config import Config
from gdmcf_tpu.diffusion.engine import Diffusion, LtState, MeanType
from gdmcf_tpu.models.registry import build_model

N_USER, N_ITEM, B = 32, 24, 8


def setup(backbone="DNNOneHotEmbeddingGCN", **kw):
    cfg = Config(backbone=backbone, dims=[16], emb_size=10, steps=5,
                 noise_scale=0.01, noise_min=0.001, noise_max=0.01, **kw)
    model = build_model(cfg, N_USER, N_ITEM)
    diff = Diffusion.create(cfg, index_in=model.needs_index)
    params = model.init(jax.random.PRNGKey(0))
    x = (jax.random.uniform(jax.random.PRNGKey(1), (B, N_ITEM)) < 0.3
         ).astype(jnp.float32)
    index = jnp.arange(B, dtype=jnp.int32)
    return cfg, model, diff, params, x, index


def test_training_losses_shapes_and_finite():
    cfg, model, diff, params, x, index = setup()
    lt = LtState.create(cfg.steps, cfg.history_num_per_term)
    loss, new_lt, aux = diff.training_losses(
        model.apply, params, x, index, jax.random.PRNGKey(2), lt, reweight=True)
    assert loss.shape == (B,)
    assert jnp.all(jnp.isfinite(loss))
    assert int(new_lt.count.sum()) == B  # every example recorded once


def test_lt_ring_buffer_semantics():
    """Replicates the reference per-example update loop (ref :935-949)."""
    cfg, model, diff, params, x, index = setup()
    steps, H = cfg.steps, cfg.history_num_per_term
    lt = LtState.create(steps, H)
    ts = jnp.asarray([0, 0, 1, 0], dtype=jnp.int32)
    losses = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    new = diff.update_lt(lt, ts, losses)
    hist = np.asarray(new.history)
    cnt = np.asarray(new.count)
    assert cnt[0] == 3 and cnt[1] == 1
    np.testing.assert_allclose(hist[0, :3], [1.0, 2.0, 4.0])
    np.testing.assert_allclose(hist[1, :1], [3.0])

    # fill slot 0 to capacity, then one more -> ring shift
    lt_full = LtState(history=jnp.arange(H, dtype=jnp.float32)[None, :].repeat(steps, 0),
                      count=jnp.full((steps,), H, dtype=jnp.int32))
    new2 = diff.update_lt(lt_full, jnp.asarray([0]), jnp.asarray([99.0]))
    hist2 = np.asarray(new2.history)
    np.testing.assert_allclose(hist2[0], list(range(1, H)) + [99.0])
    assert int(np.asarray(new2.count)[0]) == H  # count saturates


def test_sample_timesteps_uniform_until_full():
    cfg, model, diff, params, x, index = setup()
    lt = LtState.create(cfg.steps, cfg.history_num_per_term)
    t, pt = diff.sample_timesteps(jax.random.PRNGKey(0), lt, 64)
    assert t.shape == (64,)
    np.testing.assert_allclose(np.asarray(pt), 1.0)
    assert np.asarray(t).min() >= 0 and np.asarray(t).max() < cfg.steps


def test_sample_timesteps_importance_when_full():
    cfg, model, diff, params, x, index = setup()
    H = cfg.history_num_per_term
    # step 2 has huge historical loss -> should be sampled overwhelmingly
    hist = jnp.ones((cfg.steps, H)) * 1e-4
    hist = hist.at[2].set(1000.0)
    lt = LtState(history=hist, count=jnp.full((cfg.steps,), H, dtype=jnp.int32))
    t, pt = diff.sample_timesteps(jax.random.PRNGKey(0), lt, 512)
    frac_2 = float((np.asarray(t) == 2).mean())
    assert frac_2 > 0.95
    assert np.all(np.asarray(pt) > 0)


def test_p_sample_runs_and_is_finite():
    cfg, model, diff, params, x, index = setup()
    scores = diff.p_sample(model.apply, params, x, index,
                           jax.random.PRNGKey(3), sampling_steps=0)
    assert scores.shape == (B, N_ITEM)
    assert jnp.all(jnp.isfinite(scores))


def test_p_sample_with_forward_noise_and_sampling_noise():
    cfg, model, diff, params, x, index = setup()
    scores = diff.p_sample(model.apply, params, x, index,
                           jax.random.PRNGKey(4), sampling_steps=3,
                           sampling_noise=True)
    assert scores.shape == (B, N_ITEM)
    assert jnp.all(jnp.isfinite(scores))


def test_p_sample_jittable():
    cfg, model, diff, params, x, index = setup()

    @jax.jit
    def sample(p, x, idx, key):
        return diff.p_sample(model.apply, p, x, idx, key, sampling_steps=0)

    s1 = sample(params, x, index, jax.random.PRNGKey(5))
    s2 = sample(params, x, index, jax.random.PRNGKey(5))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2))


def test_eps_mean_type_path():
    cfg, model, diff, params, x, index = setup(mean_type="eps")
    lt = LtState.create(cfg.steps, cfg.history_num_per_term)
    loss, _, _ = diff.training_losses(
        model.apply, params, x, index, jax.random.PRNGKey(6), lt, reweight=True)
    assert jnp.all(jnp.isfinite(loss))
    scores = diff.p_sample(model.apply, params, x, index,
                           jax.random.PRNGKey(7), sampling_steps=0)
    assert jnp.all(jnp.isfinite(scores))


def test_training_losses_grad():
    cfg, model, diff, params, x, index = setup()
    lt = LtState.create(cfg.steps, cfg.history_num_per_term)

    def loss_fn(p):
        loss, new_lt, aux = diff.training_losses(
            model.apply, p, x, index, jax.random.PRNGKey(8), lt)
        return loss.mean(), new_lt

    (val, new_lt), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)
    assert np.isfinite(float(val))


def test_update_lt_vectorized_matches_sequential_oracle():
    """The closed-form batched ring update == the reference's per-example
    sequential loop, across random fill states."""
    cfg, model, diff, params, x, index = setup()
    steps, H = cfg.steps, cfg.history_num_per_term
    rng = np.random.default_rng(7)
    for trial in range(12):
        cnt0 = rng.integers(0, H + 1, steps).astype(np.int32)
        hist0 = rng.standard_normal((steps, H)).astype(np.float32)
        # entries beyond count are zeros in real states
        for t in range(steps):
            hist0[t, cnt0[t]:] = 0.0
        lt = LtState(history=jnp.asarray(hist0), count=jnp.asarray(cnt0))
        bsz = int(rng.integers(1, 40))
        ts = jnp.asarray(rng.integers(0, steps, bsz).astype(np.int32))
        losses = jnp.asarray(rng.standard_normal(bsz).astype(np.float32))
        fast = diff.update_lt(lt, ts, losses)
        slow = diff.update_lt_sequential(lt, ts, losses)
        np.testing.assert_array_equal(np.asarray(fast.count),
                                      np.asarray(slow.count))
        np.testing.assert_allclose(np.asarray(fast.history),
                                   np.asarray(slow.history), rtol=1e-6)


def test_noise_scale_zero_degenerate_path():
    """noise_scale=0 (no coefficient tables): the reverse loop iterates the
    model directly in ONE lax.scan (ref gaussian_diffusion.py:697-701) and
    stays finite; sampling_steps>0 fails loudly instead of dying on
    coeffs=None deep inside the trace (the reference crashes the same way —
    calculate_for_diffusion is skipped at :87-91)."""
    import pytest

    # plain DNN: the degenerate loop calls model(x_t, t) with no graph side
    # input, exactly like the reference's loop (graph backbones crash there
    # in the reference too)
    cfg = Config(backbone="DNN", dims=[16], emb_size=10,
                 steps=5, noise_scale=0.0)
    model = build_model(cfg, N_USER, N_ITEM)
    diff = Diffusion.create(cfg, index_in=model.needs_index)
    params = model.init(jax.random.PRNGKey(0))
    x = (jax.random.uniform(jax.random.PRNGKey(1), (B, N_ITEM)) < 0.3
         ).astype(jnp.float32)
    index = jnp.arange(B, dtype=jnp.int32)
    assert diff.coeffs is None
    scores = diff.p_sample(model.apply, params, x, index,
                           jax.random.PRNGKey(9), sampling_steps=0)
    assert scores.shape == (B, N_ITEM)
    assert jnp.all(jnp.isfinite(scores))
    with pytest.raises(ValueError, match="sampling_steps=0"):
        diff.p_sample(model.apply, params, x, index,
                      jax.random.PRNGKey(9), sampling_steps=2)
