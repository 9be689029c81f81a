"""Pin the scan-amortized timing harness (benchmarks/_timing.py).

The harness guards against three measured XLA-elision traps (see its module
docstring). These tests pin the two machine-checkable behaviors on the CPU
backend:

- a genuinely salted computation times to a finite, positive per-iteration
  figure and passes the hoist guard;
- a salt-independent scalar body (full-hoist candidate: XLA sinks it out of
  the while loop, so wall does not grow with k) raises RuntimeError instead
  of silently reporting a near-zero time — the exact failure mode that
  produced impossible eval-step figures on the TPU relay.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "benchmarks"))

from _timing import dispatch_floor, scan_timeit  # noqa: E402


@pytest.fixture(scope="module")
def mat():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((512, 512)).astype(np.float32))


def test_genuine_work_times_positive(mat):
    ms = scan_timeit(lambda x, s: (x + s * 1e-12) @ x, mat, k=20, calls=3)
    assert np.isfinite(ms) and ms > 0.0


def test_full_hoist_raises(mat):
    """Scalar output, salt unused -> XLA sinks the body; guard must raise."""
    import jax.numpy as jnp

    with pytest.raises(RuntimeError, match="hoist guard"):
        scan_timeit(lambda x, s: jnp.sum(jnp.tanh(x @ x) @ x), mat,
                    k=50, calls=3)


def test_check_hoist_optional(mat):
    """check_hoist=False must not raise even on a hoistable body."""
    import jax.numpy as jnp

    ms = scan_timeit(lambda x, s: jnp.sum(jnp.tanh(x @ x) @ x), mat,
                     k=20, calls=3, check_hoist=False)
    assert np.isfinite(ms)


def test_dispatch_floor_small_positive():
    fl = dispatch_floor()
    # trivial program round-trip: microseconds on CPU, tens of ms over the
    # TPU relay — either way far under a second and strictly positive
    assert 0.0 < fl < 1.0
