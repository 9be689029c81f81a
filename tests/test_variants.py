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


# ---------------------------------------------------------------------------
# legacy n-state machinery (VERDICT round-1 item 9)
# ---------------------------------------------------------------------------

def _legacy_diff():
    from gdmcf_tpu.config import Config
    from gdmcf_tpu.diffusion.engine import Diffusion
    cfg = Config(dims=[8], steps=10, noise_scale=0.01, batch_size=10,
                 fidelity=True)
    return Diffusion.create(cfg, variant="legacy")


def test_legacy_apply_noise_runs_and_is_binary():
    """The reference's n-state apply_noise is dead AND shape-broken
    (gaussian_diffusion.py:91-108 broadcasts [bs,2,2] against eye(2810));
    our closed-form implementation of its intent must actually run."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    diff = _legacy_diff()
    key = jax.random.PRNGKey(0)
    x = jnp.ones((10, 20), dtype=jnp.float32)
    ts = jnp.full((10,), 5, dtype=jnp.int32)
    out = diff.legacy_apply_noise(key, ts, x)
    assert out.shape == x.shape
    vals = np.unique(np.asarray(out))
    assert set(vals.tolist()) <= {0.0, 1.0}
    # deterministic under the same key
    out2 = diff.legacy_apply_noise(key, ts, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_legacy_apply_noise_blend_keeps_most_of_x():
    """mix_tensors(x, x_t, 0.8): ~80% of cells come from x (ref :269-271)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    diff = _legacy_diff()
    x = jnp.ones((20, 50), dtype=jnp.float32)
    ts = jnp.full((20,), 2, dtype=jnp.int32)
    fracs = []
    for s in range(5):
        out = diff.legacy_apply_noise(jax.random.PRNGKey(s), ts, x)
        fracs.append(float(np.asarray(out).mean()))
    # >= 0.8 of cells copy x(=1); the sampled remainder is mostly 0
    assert 0.75 < np.mean(fracs) <= 1.0


def test_legacy_apply_noise_zero_rows_do_not_crash():
    """The reference's multinomial raises on all-zero rows; the closed form
    samples the a->0 uniform limit instead (documented repair)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    diff = _legacy_diff()
    x = jnp.zeros((6, 12), dtype=jnp.float32)
    ts = jnp.arange(6, dtype=jnp.int32)
    out = diff.legacy_apply_noise(jax.random.PRNGKey(1), ts, x)
    assert np.isfinite(np.asarray(out)).all()


def test_legacy_apply_noise_x_base_blend():
    import jax
    import jax.numpy as jnp
    import numpy as np

    diff = _legacy_diff()
    x = jnp.ones((10, 30), dtype=jnp.float32)
    base = jnp.zeros((10, 30), dtype=jnp.float32)
    ts = jnp.full((10,), 3, dtype=jnp.int32)
    out = diff.legacy_apply_noise(jax.random.PRNGKey(2), ts, x, x_base=base)
    # 99% of cells come from x_base (=0)
    assert float(np.asarray(out).mean()) < 0.05


def test_noise_scale_zero_refuses_graph_backbone():
    """noise_scale=0's degenerate reverse path has no synthetic graph; a
    graph-dereferencing backbone (the GCN family) would crash with an
    opaque mid-trace TypeError — the reference crashes identically
    (model(x_t, t, x_tU) at gaussian_diffusion.py:699 vs DNN.py:1241's
    unconditional graph.argmax). The Trainer must refuse loudly at
    construction (round-5 review finding)."""
    import pytest

    from gdmcf_tpu.config import Config
    from gdmcf_tpu.train.trainer import Trainer

    cfg = Config(backbone="DNNOneHotEmbeddingGCN", dims=[32], emb_size=10,
                 steps=5, noise_scale=0.0, reweight=False, batch_size=16,
                 sampling_steps=0)
    with pytest.raises(ValueError, match="noise_scale=0 cannot serve"):
        Trainer(cfg, 64, 48)
    # graph-free backbones keep working in the degenerate mode
    cfg_ok = Config(backbone="DNN", dims=[32], emb_size=10, steps=5,
                    noise_scale=0.0, reweight=False, batch_size=16,
                    sampling_steps=0)
    Trainer(cfg_ok, 64, 48)
