"""Schedule/coefficient tables vs closed form (SURVEY.md §4 test pyramid #1)."""

import numpy as np
import pytest

from gdmcf_tpu.diffusion.schedules import (
    betas_for_alpha_bar,
    betas_from_linear_variance,
    compute_coeffs,
    extract,
    get_betas,
)


def test_linear_schedule_endpoints():
    betas = get_betas("linear", 10, 0.1, 0.001, 0.01, beta_fixed=False)
    assert np.isclose(betas[0], 0.1 * 0.001)
    assert np.isclose(betas[-1], 0.1 * 0.01)
    assert np.all(np.diff(betas) > 0)


def test_beta_fixed_pins_first_step():
    betas = get_betas("linear", 10, 0.1, 0.001, 0.01, beta_fixed=True)
    assert betas[0] == pytest.approx(1e-5)


def test_linear_var_recovers_variance_ramp():
    """betas_from_linear_variance inverts the cumulative variance ramp."""
    steps = 20
    variance = np.linspace(1e-4, 1e-2, steps)
    betas = betas_from_linear_variance(steps, variance)
    alpha_bar = np.cumprod(1.0 - betas)
    np.testing.assert_allclose(1.0 - alpha_bar, variance, rtol=1e-10)


def test_cosine_schedule_matches_alpha_bar_fn():
    import math
    steps = 16
    fn = lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
    betas = betas_for_alpha_bar(steps, fn)
    assert np.all(betas > 0) and np.all(betas <= 0.999)
    # alpha_bar reconstruction matches fn up to the max_beta clamp (the clamp
    # floors the final near-zero alpha_bar, so compare with absolute tolerance)
    ab = np.cumprod(1 - betas)
    expect = np.array([fn((i + 1) / steps) / fn(0) for i in range(steps)])
    np.testing.assert_allclose(ab, expect, rtol=1e-6, atol=1e-5)


def test_binomial_schedule():
    betas = get_betas("binomial", 5, 0.1, 0.001, 0.01, beta_fixed=False)
    np.testing.assert_allclose(betas, [1 / (5 - t + 1) for t in range(5)])


def test_unknown_schedule_raises():
    with pytest.raises(NotImplementedError):
        get_betas("nope", 5, 0.1, 0.001, 0.01)


def test_coeff_identities():
    betas = get_betas("linear-var", 5, 0.01, 0.001, 0.01)
    c = compute_coeffs(betas)
    alphas = 1.0 - np.asarray(c.betas, dtype=np.float64)
    ab = np.cumprod(alphas)
    np.testing.assert_allclose(np.asarray(c.alphas_cumprod), ab, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(c.alphas_cumprod_prev), np.concatenate([[1.0], ab[:-1]]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(c.alphas_cumprod_next), np.concatenate([ab[1:], [0.0]]), rtol=1e-6)
    # q(x_{t-1}|x_t,x_0) mean coefficients sum: c1 + c2 * sqrt stuff — check
    # the defining formulas instead of an identity
    # recompute in float64 from the raw betas (the f32 tables suffer
    # catastrophic cancellation in 1-alpha_bar at t=0 where beta=1e-5)
    betas64 = np.asarray(betas, dtype=np.float64)
    ab64 = np.cumprod(1 - betas64)
    ab_prev64 = np.concatenate([[1.0], ab64[:-1]])
    np.testing.assert_allclose(
        np.asarray(c.posterior_mean_coef1),
        (betas64 * np.sqrt(ab_prev64) / (1 - ab64)).astype(np.float32),
        rtol=1e-5)
    # posterior log variance clipped: element 0 equals element 1
    plv = np.asarray(c.posterior_log_variance_clipped)
    assert plv[0] == pytest.approx(plv[1])


def test_extract_broadcast_and_negative_wrap():
    import jax.numpy as jnp
    arr = jnp.asarray([1.0, 2.0, 3.0])
    t = jnp.asarray([0, 2, -1])
    out = extract(arr, t, 3)
    assert out.shape == (3, 1, 1)
    np.testing.assert_allclose(np.asarray(out).ravel(), [1.0, 3.0, 3.0])
