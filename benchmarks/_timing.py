"""Scan-amortized on-chip timing for sub-ms pieces on the relayed backend.

Per-dispatch timing is unusable here even with per-call value fetches: RTT
jitter is a few hundred us, and dispatch/fetch overlap can report figures
BELOW the ~2.5 ms per-execute floor (a measured impossibility). The only
protocol that has survived cross-checks is the one bench.py uses for train
steps: iterate the piece K times inside ONE program with a lax.scan whose
carry consumes each iteration's output (so nothing can be elided or
reordered across iterations), force each dispatch with a scalar value
fetch, subtract the measured fetch RTT, divide by K.
"""

from __future__ import annotations

import time


def scan_timeit(fn, *args, k: int = 50, calls: int = 8) -> float:
    """Mean ms per execution of ``fn(*args, salt)`` (salt: int32 scalar that
    must reach the computation so iterations stay distinct)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(s0, *a):
        def body(c, i):
            out = fn(*a, s0 + i)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return c + jnp.ravel(leaf)[0].astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(k))
        return c

    out = run(0, *args)
    float(out)                       # compile + materialize
    t0 = time.perf_counter()
    for _ in range(5):
        float(out)
    rtt = (time.perf_counter() - t0) / 5
    t0 = time.perf_counter()
    for j in range(calls):
        out = run((j + 1) * k, *args)
        float(out)
    wall = time.perf_counter() - t0
    return max(wall / calls - rtt, 0.0) / k * 1000.0
