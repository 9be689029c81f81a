"""Scan-amortized on-chip timing for sub-ms pieces on the relayed backend.

Per-dispatch timing is unusable here even with per-call value fetches: RTT
jitter is a few hundred us, and dispatch/fetch overlap can report figures
BELOW the ~2.5 ms per-execute floor (a measured impossibility). The only
protocol that has survived cross-checks is the one bench.py uses for train
steps: iterate the piece K times inside ONE program with a lax.scan whose
carry consumes every iteration's outputs (so nothing can be elided,
reordered, or dead-code-eliminated across iterations), force each dispatch
with a scalar value fetch, subtract the measured per-dispatch floor,
divide by K.

Three traps this file exists to encode (all were live bugs once):
- jax caches ``_npy_value`` after the first fetch, so timing repeated
  ``float(x)`` on one materialized array measures ~0; the per-dispatch
  floor must be measured with FRESH dispatches of a trivial program.
- a carry that consumes only the first output leaf lets XLA dead-code
  -eliminate the computation behind every other leaf (verified in HLO:
  chunked top-k lost its index gather); consume a reduction of EVERY leaf.
- the salt must reach a LIVE input of the computation. Salting only the
  RNG key of a deterministic piece (e.g. the eval step at
  sampling_steps=0/sampling_noise=False, whose random synthetic graph is
  dead because directed-GCN user rows are graph-independent) lets XLA
  hoist the entire body out of the while loop ("...sunk" body in HLO:
  zero convolutions left inside) and the measurement reads ~0 regardless
  of k. Salt a real tensor input (``x + salt * 1e-12``) when unsure, and
  sanity-check that the measured wall GROWS with k.
"""

from __future__ import annotations

import time


def dispatch_floor(calls: int = 6) -> float:
    """Seconds per dispatch+fetch of a trivial jitted program (fresh
    argument each call so nothing is cached or elided)."""
    import jax

    @jax.jit
    def nop(s):
        return s * 1.0

    float(nop(-1))                   # compile
    t0 = time.perf_counter()
    for j in range(calls):
        float(nop(j))
    return (time.perf_counter() - t0) / calls


def scan_timeit(fn, *args, k: int = 50, calls: int = 8,
                check_hoist: bool = True) -> float:
    """Mean ms per execution of ``fn(*args, salt)`` (salt: int32 scalar that
    must reach the computation so iterations stay distinct).

    With ``check_hoist`` (default), also times a shorter scan and raises
    RuntimeError if the wall does not grow with k — the signature of XLA
    proving the body loop-invariant and sinking it out of the while loop
    (trap 3 in the module docstring). Costs one extra compile. Limitation:
    a PARTIAL hoist (big ops sunk, a residual per-iteration reduction left
    in the loop — observed on CPU XLA) still scales with k and passes this
    guard while under-reporting; the salt rule remains the real defense.
    """
    import jax
    import jax.numpy as jnp

    def make_run(n):
        @jax.jit
        def run(s0, *a):
            def body(c, i):
                out = fn(*a, s0 + i)
                # consume a reduction of EVERY leaf: a single-element read
                # lets XLA DCE the work behind the other leaves
                tot = sum(jnp.sum(leaf).astype(jnp.float32)
                          for leaf in jax.tree_util.tree_leaves(out))
                return c + tot, None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
            return c
        return run

    def mean_wall(run, n, ncalls):
        t0 = time.perf_counter()
        for j in range(ncalls):
            float(run((j + 1) * n, *args))
        return (time.perf_counter() - t0) / ncalls

    run_k = make_run(k)
    float(run_k(0, *args))           # compile + materialize
    ks = max(k // 5, 1) if check_hoist and k > 1 else None
    if ks is not None:
        run_s = make_run(ks)
        float(run_s(0, *args))
    floor = dispatch_floor()
    wall_k = mean_wall(run_k, k, calls)
    per_iter = max(wall_k - floor, 0.0) / k
    if ks is not None:
        wall_s = mean_wall(run_s, ks, max(calls // 2, 3))
        expected_delta = (k - ks) * per_iter
        # absolute gate: below ~0.5 ms total delta the comparison is noise
        if expected_delta > 5e-4 and (wall_k - wall_s) < 0.5 * expected_delta:
            raise RuntimeError(
                f"scan_timeit hoist guard: wall does not grow with k "
                f"(k={k}: {wall_k*1e3:.2f} ms, k={ks}: {wall_s*1e3:.2f} ms, "
                f"expected delta {expected_delta*1e3:.2f} ms). XLA sank the "
                f"body out of the loop — the salt is not reaching a live "
                f"input of the computation; salt a real tensor input "
                f"(x + salt * 1e-12).")
    return per_iter * 1000.0
