"""Legacy / ablation diffusion variants (reference classes GaussianDiffusion
and GaussianDiffusionAblation) + mix_tensors / normal_kl helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gdmcf_tpu.config import Config
from gdmcf_tpu.diffusion.engine import (
    Diffusion,
    LtState,
    MeanType,
    mix_tensors,
    normal_kl,
)
from gdmcf_tpu.models.registry import build_model

N_USER, N_ITEM, B = 24, 20, 8


def setup(variant, backbone="DNNOneHotEmbeddingGCN", **kw):
    cfg = Config(backbone=backbone, dims=[12], emb_size=10, steps=5,
                 noise_scale=0.01, diffusion_variant=variant, **kw)
    model = build_model(cfg, N_USER, N_ITEM)
    diff = Diffusion.create(cfg, index_in=model.needs_index, variant=variant)
    params = model.init(jax.random.PRNGKey(0))
    x = (jax.random.uniform(jax.random.PRNGKey(1), (B, N_ITEM)) < 0.3
         ).astype(jnp.float32)
    idx = jnp.arange(B, dtype=jnp.int32)
    return cfg, model, diff, params, x, idx


@pytest.mark.parametrize("variant,backbone", [
    # legacy never passes graph/index to the model (ref :204-209), so it pairs
    # with the tower backbones, not the GCN family — same constraint as the
    # reference.
    ("legacy", "DNNOneHot"),
    ("ablation", "DNNOneHotEmbeddingGCN"),
])
def test_variant_training_and_sampling(variant, backbone):
    cfg, model, diff, params, x, idx = setup(variant, backbone=backbone)
    lt = LtState.create(cfg.steps)
    loss, new_lt, aux = diff.training_losses(
        model.apply, params, x, idx, jax.random.PRNGKey(2), lt)
    assert loss.shape == (B,) and bool(jnp.all(jnp.isfinite(loss)))
    scores = diff.p_sample(model.apply, params, x, idx,
                           jax.random.PRNGKey(3), sampling_steps=0)
    assert scores.shape == (B, N_ITEM)
    assert bool(jnp.all(jnp.isfinite(scores)))


def test_legacy_has_no_contrastive_term():
    cfg, model, diff, params, x, idx = setup("legacy", backbone="DNNOneHot")
    lt = LtState.create(cfg.steps)
    _, _, aux = diff.training_losses(
        model.apply, params, x, idx, jax.random.PRNGKey(2), lt)
    assert float(aux["closs"]) == 0.0


def test_ablation_model_sees_clean_input():
    """With fixed params, the ablation model output must not depend on the
    continuous corruption — it always receives x_start (ref :1518-1520).
    The total loss still varies via ts/graph, so compare the model output
    through a probe: a model that echoes its input."""
    cfg, model, diff, params, x, idx = setup("ablation")

    captured = {}

    def probe_apply(params, xin, t, x_U=None, index=None, graph=None,
                    rcloss=False, train=False, rng=None):
        captured["x"] = xin
        out = jnp.zeros_like(xin)
        return (out, jnp.zeros(())) if rcloss else (out, None)

    lt = LtState.create(cfg.steps)
    diff.training_losses(probe_apply, params, x, idx,
                         jax.random.PRNGKey(4), lt)
    np.testing.assert_array_equal(np.asarray(captured["x"]), np.asarray(x))


def test_mix_tensors_statistics():
    k = jax.random.PRNGKey(0)
    a = jnp.ones((100, 100))
    b = jnp.zeros((100, 100))
    mixed = mix_tensors(k, a, b, mix_prob=0.8)
    assert abs(float(mixed.mean()) - 0.8) < 0.02
    assert set(np.unique(np.asarray(mixed))) <= {0.0, 1.0}


def test_normal_kl_zero_for_identical():
    kl = normal_kl(jnp.ones(4), jnp.zeros(4), jnp.ones(4), jnp.zeros(4))
    np.testing.assert_allclose(np.asarray(kl), 0.0)
    # KL > 0 for different distributions
    kl2 = normal_kl(jnp.zeros(4), jnp.zeros(4), jnp.ones(4), jnp.zeros(4))
    assert float(kl2.sum()) > 0


def test_absorbing_qt_bar_rows_stochastic():
    import jax.numpy as jnp
    from gdmcf_tpu.diffusion.engine import absorbing_qt_bar
    q = absorbing_qt_bar(jnp.asarray([0.0, 0.3, 1.0]), num_classes=4)
    assert q.shape == (3, 4, 4)
    # rows sum to a + (1-a)*C (the reference helper is unnormalized; parity)
    np.testing.assert_allclose(np.asarray(q.sum(-1)[1]),
                               0.3 + 0.7 * 4, rtol=1e-6)
