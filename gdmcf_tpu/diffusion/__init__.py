from gdmcf_tpu.diffusion.schedules import (
    get_betas,
    betas_from_linear_variance,
    betas_for_alpha_bar,
    compute_coeffs,
    DiffusionCoeffs,
)
from gdmcf_tpu.diffusion.engine import Diffusion, MeanType, LtState

__all__ = [
    "get_betas",
    "betas_from_linear_variance",
    "betas_for_alpha_bar",
    "compute_coeffs",
    "DiffusionCoeffs",
    "Diffusion",
    "MeanType",
    "LtState",
]
