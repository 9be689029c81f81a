"""Multi-host runtime (SURVEY.md §2.3 / §5: a net-new capability — the
reference is strictly single-process, single-GPU).

Usage on a pod slice (one process per host):

    from gdmcf_tpu.parallel import multihost
    multihost.initialize()               # jax.distributed under the hood
    mesh = multihost.global_mesh(dp=..., mp=...)

Layout convention: dp spans hosts (gradient psum rides DCN once per step),
mp stays within a host's chips (catalog all-gathers ride ICI) — the
scaling-book placement for a bandwidth-bound catalog axis.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               timeout_s: int = 300,
               heartbeat_timeout_s: Optional[int] = None) -> None:
    """jax.distributed.initialize with env fallbacks; no-op if single-process.

    Env contract (matching common launchers): COORDINATOR_ADDRESS,
    NUM_PROCESSES, PROCESS_ID. ``heartbeat_timeout_s`` (env
    HEARTBEAT_TIMEOUT_S, default jax's 100) bounds how long the surviving
    processes take to fail LOUDLY after a peer dies mid-step — the failure
    detector for SURVEY §5 (fault-injection test: test_multihost_fault.py).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return  # single-host run
    if num_processes is None:
        env = os.environ.get("NUM_PROCESSES")
        if env is None:
            # a silent default of 1 would "succeed" as a solo cluster and
            # train on the FULL dataset while the peers hang — fail loudly
            raise ValueError(
                "COORDINATOR_ADDRESS is set but NUM_PROCESSES is not: a "
                "multi-host launch must state its process count (env "
                "NUM_PROCESSES or the num_processes argument)")
        num_processes = int(env)
    process_id = process_id if process_id is not None else int(
        os.environ.get("PROCESS_ID", "0"))
    if heartbeat_timeout_s is None and os.environ.get("HEARTBEAT_TIMEOUT_S"):
        heartbeat_timeout_s = int(os.environ["HEARTBEAT_TIMEOUT_S"])
    kw = {}
    if heartbeat_timeout_s is not None:
        kw["heartbeat_timeout_seconds"] = heartbeat_timeout_s
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        initialization_timeout=timeout_s,
        **kw,
    )


def global_mesh(dp: Optional[int] = None, mp: Optional[int] = None) -> Mesh:
    """(dp, mp) mesh over all global devices. Defaults: mp = chips per host
    (catalog axis on ICI), dp = hosts (data axis over DCN).

    Devices are laid process-major: raw ``jax.devices()`` order can
    interleave hosts on a real slice, which would put mp rows across DCN
    and misalign dp blocks with the hosts feeding them."""
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    if mp is None:
        mp = max(jax.local_device_count(), 1)
    if dp is None:
        dp = len(devices) // mp
    if dp * mp != len(devices):
        raise ValueError(
            f"mesh (dp={dp}, mp={mp}) does not tile the {len(devices)} "
            f"global devices ({jax.process_count()} processes x "
            f"{jax.local_device_count()} local) — pick dp*mp == device "
            "count")
    grid = np.asarray(devices).reshape(dp, mp)
    return Mesh(grid, axis_names=("dp", "mp"))


def is_main_process() -> bool:
    return jax.process_index() == 0


def local_row_range(n_rows: int) -> range:
    """This process's disjoint user-row shard for multi-host data loading:
    feed ``dataset[local_row_range(len(dataset))]`` rows to
    ``Trainer._put_batch`` and the global batch is their concatenation over
    processes (dp axis). Shards are EXACTLY equal — the remainder rows are
    dropped (like drop_last) so every host runs the same number of global
    collective steps per epoch; a skewed shard would deadlock the slice."""
    nproc = jax.process_count()
    pid = jax.process_index()
    base = n_rows // nproc
    if base == 0:
        raise ValueError(
            f"{n_rows} rows cannot shard over {nproc} processes: every host "
            "would get an empty shard and silently train on nothing")
    return range(pid * base, (pid + 1) * base)


_GATHER_STATE: dict = {}  # device-id key -> (mesh, jitted identity)


def allgather_host_vectors(vec: np.ndarray) -> np.ndarray:
    """Bit-exact all-gather of one small host-local array per process:
    returns ``[nproc, *vec.shape]`` stacked in process-index order.

    The payload rides the wire as raw bytes (uint8 view), so float64 metric
    sums survive exactly even on backends without f64 arithmetic. Collective
    — every process must call it with an equal-shape/dtype array."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    vec = np.ascontiguousarray(vec)
    nproc = jax.process_count()
    if nproc == 1:
        return vec[None]
    payload = vec.view(np.uint8).reshape(1, -1)
    nloc = jax.local_device_count()
    # process-major device order => global row block p belongs to process p
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    key = tuple(d.id for d in devs)
    if key not in _GATHER_STATE:
        mesh = Mesh(np.asarray(devs), axis_names=("all",))
        # one jitted identity reused across calls: a fresh lambda per call
        # would retrace/recompile the gather on every metric reduce
        _GATHER_STATE[key] = (mesh, jax.jit(
            lambda x: x, out_shardings=NamedSharding(mesh, P())))
    mesh, gather = _GATHER_STATE[key]
    local = np.ascontiguousarray(np.repeat(payload, nloc, axis=0))
    g = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("all")), local,
        (nproc * nloc, payload.shape[1]))
    rows = np.asarray(jax.device_get(gather(g)))[::nloc]
    return rows.view(vec.dtype).reshape((nproc,) + vec.shape)


_SYNC_STATE: dict = {}  # device-id key -> compiled barrier fn


def sync_hosts(name: str = "barrier", devices=None) -> None:
    """Cross-host barrier via a tiny psum (safe on single host too).
    The compiled barrier is cached per device set — a fresh shard_map per
    call would retrace/recompile on every barrier.

    ``name`` is a debugging label only: every call shares the one psum
    barrier regardless of name (there are no independent named channels —
    do not rely on names for ordering between distinct barrier points)."""
    from jax.sharding import PartitionSpec as P
    devices = tuple(devices if devices is not None else jax.devices())
    key = tuple(d.id for d in devices)
    fn = _SYNC_STATE.get(key)
    if fn is None:
        mesh = Mesh(np.asarray(devices).reshape(len(devices)),
                    axis_names=("all",))
        fn = _SYNC_STATE[key] = jax.jit(jax.shard_map(
            lambda x: jax.lax.psum(x, "all"),
            mesh=mesh, in_specs=P("all"), out_specs=P(),
            check_vma=False))
    np.asarray(fn(np.ones((len(devices),), np.float32)))
