"""gdmcf_tpu — a TPU-native graph-diffusion recommender framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the GDMCF
reference (a single-GPU PyTorch research codebase; see SURVEY.md). The compute
path is pure-functional JAX compiled by XLA for TPU: static shapes, dense-masked
graph propagation on the MXU, fused reverse-diffusion sampling via ``lax.scan``,
and mesh sharding (``jax.sharding``) for data/catalog parallelism.

Layer map (bottom-up, mirroring SURVEY.md §1):
  ops/        L0  kernels: SpMM (Pallas), vectorized ranking metrics, top-k
  data/       L1  edge-list -> CSR ingest, batching, graph format converters
  models/     L2+L3  dense bipartite GCN propagation + denoiser backbones
  diffusion/  L4  schedules, continuous+discrete channels, losses, sampler
  train/      L6  jitted train/eval loops, checkpointing, early stop
  parallel/   mesh construction and sharding rules (DP x catalog-MP)
  config.py   L7  typed config with YAML presets + CLI overrides
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("GDMCF_DEVICE", "").lower() == "cpu":
    # Pin compute to host CPU (this image's sitecustomize force-registers the
    # axon TPU backend, which admits one client process at a time; use this
    # for side runs / probes while the chip is busy).
    import jax as _jax
    _jax.config.update("jax_default_device", _jax.devices("cpu")[0])

from gdmcf_tpu.config import Config, load_config

__all__ = ["Config", "load_config", "Trainer", "Diffusion", "Recommender",
           "import_reference_checkpoint", "__version__"]

_LAZY = {
    # public API surface, imported on first access (keeps bare
    # `import gdmcf_tpu` free of the jax/orbax import cost)
    "Trainer": ("gdmcf_tpu.train.trainer", "Trainer"),
    "Diffusion": ("gdmcf_tpu.diffusion.engine", "Diffusion"),
    "Recommender": ("gdmcf_tpu.serve", "Recommender"),
    "import_reference_checkpoint": ("gdmcf_tpu.compat",
                                    "import_reference_checkpoint"),
}


def __getattr__(name):  # PEP 562
    try:
        mod, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(f"module 'gdmcf_tpu' has no attribute {name!r}")
    import importlib
    return getattr(importlib.import_module(mod), attr)
