"""Worker process for the multi-host smoke test (launched by
tests/test_multihost.py, one process per simulated host).

Exercises the real multihost contract end-to-end on CPU:
  initialize() -> global_mesh() -> a sharded psum step over a global array
  assembled from per-process shards -> sync_hosts().
"""

import os
import sys

# must happen before jax import: 2 virtual devices per "host"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from gdmcf_tpu.parallel import multihost  # noqa: E402


def main():
    multihost.initialize()  # COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID env
    pid = jax.process_index()
    nproc = jax.process_count()
    assert nproc == int(os.environ["NUM_PROCESSES"]), nproc

    mesh = multihost.global_mesh()  # dp = hosts, mp = local devices
    assert dict(mesh.shape) == {"dp": nproc, "mp": 2}, mesh.shape

    # global [4, 8] array, dp-sharded by host: each process contributes its
    # own rows — the real multi-host data path (no host sees the full array)
    global_shape = (2 * nproc, 8)
    sharding = NamedSharding(mesh, P("dp", None))
    local = np.full((2, 8), float(pid + 1), dtype=np.float32)
    arr = jax.make_array_from_process_local_data(sharding, local, global_shape)

    @jax.jit
    def step(x):
        fn = jax.shard_map(
            lambda s: jax.lax.psum(s.sum(), ("dp", "mp")),
            mesh=mesh, in_specs=P("dp", None), out_specs=P(),
            check_vma=False)
        return fn(x)

    total = float(np.asarray(jax.device_get(step(arr))))
    # each host block sums to 2*8*(pid+1); P('dp', None) replicates a block
    # across the mp axis, so the full psum counts every block mp(=2) times
    expect = 2.0 * float(sum(16.0 * (i + 1) for i in range(nproc)))
    assert total == expect, (total, expect)

    multihost.sync_hosts()
    assert multihost.is_main_process() == (pid == 0)
    print(f"WORKER_OK pid={pid} total={total}", flush=True)


if __name__ == "__main__":
    main()
    sys.exit(0)
