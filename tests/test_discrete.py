"""Discrete 2-state channel: closed form vs explicit transition matrices."""

import jax
import jax.numpy as jnp
import numpy as np

from gdmcf_tpu.config import Config
from gdmcf_tpu.diffusion.engine import Diffusion, MeanType


def make_diffusion(**kw):
    cfg = Config(steps=5, noise_scale=0.01, noise_min=0.001, noise_max=0.01,
                 noise_schedule="linear-var", **kw)
    return Diffusion.create(cfg)


def qt_bar_matrix(alpha_bar, eps):
    """Explicit Q_bar = a*I + (1-a)*u_x (ref gaussian_diffusion.py:597-614)."""
    u_x = np.array([[eps, 1 - eps], [eps, 1 - eps]])
    return alpha_bar * np.eye(2) + (1 - alpha_bar) * u_x


def test_qt_bar_rows_are_stochastic():
    for a in [0.0, 0.3, 0.9995]:
        q = qt_bar_matrix(a, 0.9995)
        np.testing.assert_allclose(q.sum(axis=1), 1.0)


def test_discrete_p_one_matches_matrix_product():
    d = make_diffusion()
    eps = d.discrete_eps
    for a in [0.0, 0.01, 0.5, 0.99]:
        q = qt_bar_matrix(a, eps)
        # p(state 1 | x) = row_x of onehot(x) @ Q_bar, column 1
        for x in [0.0, 1.0]:
            expected = q[int(x), 1]
            got = d.discrete_p_one(jnp.asarray([a]), jnp.asarray([[x]]))
            assert float(got[0, 0]) == np.float32(expected) or \
                abs(float(got[0, 0]) - expected) < 1e-6


def test_fidelity_alpha_bar_is_ts_over_batch():
    d = make_diffusion(fidelity=True)
    ts = jnp.asarray([0, 2, 4])
    a = d._alpha_bar_discrete(ts, batch_size=8)
    np.testing.assert_allclose(np.asarray(a), [0.0, 0.25, 0.5])


def test_corrected_alpha_bar_indexes_cumprod():
    d = make_diffusion(fidelity=False)
    ts = jnp.asarray([0, 4])
    a = d._alpha_bar_discrete(ts, batch_size=8)
    np.testing.assert_allclose(np.asarray(a),
                               np.asarray(d.coeffs.alphas_cumprod)[[0, 4]])


def test_corrupt_discrete_is_delete_only():
    """channel1 can only be 1 where x_start is 1 (ref AND mask :851)."""
    d = make_diffusion()
    key = jax.random.PRNGKey(0)
    x = (jax.random.uniform(key, (16, 50)) < 0.3).astype(jnp.float32)
    ts = jnp.zeros((16,), dtype=jnp.int32)
    x_tU = d.corrupt_discrete(jax.random.PRNGKey(1), ts, x)
    c0, c1 = np.asarray(x_tU[..., 0]), np.asarray(x_tU[..., 1])
    xn = np.asarray(x)
    assert np.all(c1 <= xn)           # delete-only
    assert np.all(c0 <= 1 - xn)       # channel0 only where x was 0
    assert np.all(c0 + c1 <= 1)       # (0,0) disagreement state allowed


def test_corrupt_statistics():
    """Empirical keep-rate matches p(1|x=1) = a + (1-a)(1-eps)."""
    cfg = Config(steps=5, noise_scale=0.01, discrete=0.8, fidelity=True)
    d = Diffusion.create(cfg)
    B, n = 64, 2000
    x = jnp.ones((B, n))
    ts = jnp.full((B,), 3, dtype=jnp.int32)
    a = 3.0 / B
    p_keep = a + (1 - a) * (1 - 0.8)
    x_tU = d.corrupt_discrete(jax.random.PRNGKey(2), ts, x)
    keep_rate = float(np.asarray(x_tU[..., 1]).mean())
    assert abs(keep_rate - p_keep) < 0.01


def test_inference_sprinkle_rate():
    """On a zero graph state, p(new edge) = (1-a)(1-eps)."""
    cfg = Config(steps=5, noise_scale=0.01, discrete=0.99, fidelity=True)
    d = Diffusion.create(cfg)
    B, n = 64, 4000
    g = jnp.zeros((B, n))
    ts = jnp.zeros((B,), dtype=jnp.int32)
    s = d.apply_noise(jax.random.PRNGKey(3), ts, g)
    rate = float(np.asarray(s).mean())
    assert abs(rate - 0.01) < 0.002
