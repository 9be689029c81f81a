from gdmcf_tpu.parallel.mesh import make_mesh
from gdmcf_tpu.parallel.sharding import (
    DEFAULT_RULES,
    batch_spec,
    param_specs,
    shard_params,
)

__all__ = ["make_mesh", "DEFAULT_RULES", "batch_spec", "param_specs",
           "shard_params"]
