"""Beta schedules and diffusion coefficient tables.

Semantics match the reference (``/root/reference/models/gaussian_diffusion.py``):
  - get_betas: linear / linear-var / cosine / binomial schedules (ref :616-637)
  - betas_from_linear_variance (ref :1766-1776 / :1138-1148)
  - betas_for_alpha_bar (ref :1778-1791)
  - compute_coeffs: the cumprod/posterior tables (ref calculate_for_diffusion,
    :639-666), with beta[0] pinned to 1e-5 when ``beta_fixed`` (ref :577-579).

Tables are computed host-side in float64 (as the reference does) and stored as
float32 device arrays: the reference's ``_extract_into_tensor`` casts to float32
at every lookup anyway (ref :544), so float32 tables are exact-equivalent at the
point of use while keeping TPU-friendly dtypes.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


def betas_from_linear_variance(steps: int, variance: np.ndarray, max_beta: float = 0.999) -> np.ndarray:
    """Recover betas whose cumulative variance (1 - alpha_bar) is the given ramp."""
    alpha_bar = 1.0 - variance
    betas = [1.0 - alpha_bar[0]]
    for i in range(1, steps):
        betas.append(min(1.0 - alpha_bar[i] / alpha_bar[i - 1], max_beta))
    return np.array(betas, dtype=np.float64)


def betas_for_alpha_bar(num_diffusion_timesteps: int, alpha_bar, max_beta: float = 0.999) -> np.ndarray:
    """Betas from a continuous alpha_bar(t) function (cosine schedule helper)."""
    betas = []
    for i in range(num_diffusion_timesteps):
        t1 = i / num_diffusion_timesteps
        t2 = (i + 1) / num_diffusion_timesteps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas, dtype=np.float64)


def get_betas(
    noise_schedule: str,
    steps: int,
    noise_scale: float,
    noise_min: float,
    noise_max: float,
    beta_fixed: bool = True,
) -> np.ndarray:
    """Named beta schedule (ref get_betas :616-637 + beta_fixed pin :577-579)."""
    if noise_schedule in ("linear", "linear-var"):
        start = noise_scale * noise_min
        end = noise_scale * noise_max
        ramp = np.linspace(start, end, steps, dtype=np.float64)
        betas = ramp if noise_schedule == "linear" else betas_from_linear_variance(steps, ramp)
    elif noise_schedule == "cosine":
        betas = betas_for_alpha_bar(
            steps, lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
        )
    elif noise_schedule == "binomial":
        ts = np.arange(steps)
        betas = np.array([1.0 / (steps - t + 1) for t in ts], dtype=np.float64)
    else:
        raise NotImplementedError(f"unknown beta schedule: {noise_schedule}!")

    betas = np.asarray(betas, dtype=np.float64)
    if beta_fixed:
        # "The variance beta_1 of the first step is fixed to a small constant
        # to prevent overfitting" (ref :577-579).
        betas = betas.copy()
        betas[0] = 0.00001
    assert betas.ndim == 1 and len(betas) == steps
    assert (betas > 0).all() and (betas <= 1).all(), "betas out of range"
    return betas


class DiffusionCoeffs(NamedTuple):
    """Precomputed per-step diffusion tables (ref calculate_for_diffusion :639-666).

    Stored as HOST numpy arrays: they embed as literal constants at trace
    time (length-``steps`` vectors), so no device array, no device->host
    constant fetch per trace, and jitted fns can close over them freely.
    """

    betas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_prev: np.ndarray
    alphas_cumprod_next: np.ndarray
    sqrt_alphas_cumprod: np.ndarray
    sqrt_one_minus_alphas_cumprod: np.ndarray
    log_one_minus_alphas_cumprod: np.ndarray
    sqrt_recip_alphas_cumprod: np.ndarray
    sqrt_recipm1_alphas_cumprod: np.ndarray
    posterior_variance: np.ndarray
    posterior_log_variance_clipped: np.ndarray
    posterior_mean_coef1: np.ndarray
    posterior_mean_coef2: np.ndarray


def compute_coeffs(betas: np.ndarray, dtype=np.float32) -> DiffusionCoeffs:
    betas = np.asarray(betas, dtype=np.float64)
    steps = len(betas)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])
    alphas_cumprod_next = np.concatenate([alphas_cumprod[1:], [0.0]])
    assert alphas_cumprod_prev.shape == (steps,)

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    # log-variance clipped at t=0 by reusing the t=1 entry (ref :656-658)
    posterior_log_variance_clipped = np.log(
        np.concatenate([posterior_variance[1:2], posterior_variance[1:]])
    )

    def dev(x):
        return np.asarray(x, dtype=dtype)

    return DiffusionCoeffs(
        betas=dev(betas),
        alphas_cumprod=dev(alphas_cumprod),
        alphas_cumprod_prev=dev(alphas_cumprod_prev),
        alphas_cumprod_next=dev(alphas_cumprod_next),
        sqrt_alphas_cumprod=dev(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=dev(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=dev(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=dev(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=dev(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        posterior_variance=dev(posterior_variance),
        posterior_log_variance_clipped=dev(posterior_log_variance_clipped),
        posterior_mean_coef1=dev(betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
        posterior_mean_coef2=dev((1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)),
    )


def extract(arr, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-example coefficients and broadcast to an ndim-rank tensor.

    Equivalent of the reference's ``_extract_into_tensor`` (ref :529-547):
    negative t wraps (torch-style), output dtype float32.
    """
    out = jnp.asarray(arr)[t].astype(jnp.float32)
    return out.reshape(out.shape + (1,) * (ndim - 1))
