"""Profiling hooks (SURVEY.md §5: the reference has only commented-out
``time.time()`` deltas; this provides first-class tracing).

- ``trace(logdir)``: context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace of XLA ops, DMA, and host activity.
- ``StepTimer``: steady-state steps/s and examples/s with warmup discard.
- ``compiled_cost(fn, *args)``: XLA's own FLOP/bytes estimates for a jitted
  function (the reference's commented thop profiling, done properly).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self._count = 0
        self._t0: Optional[float] = None
        self._timed_steps = 0

    def tick(self) -> None:
        # clock starts as the first post-warmup tick begins — checking
        # BEFORE the increment keeps warmup=0 working (the old post
        # -increment equality never fired and reported 0.0 forever)
        if self._count == self.warmup and self._t0 is None:
            self._t0 = time.perf_counter()
        self._count += 1
        if self._count > self.warmup:
            self._timed_steps += 1

    def steps_per_s(self) -> float:
        if self._t0 is None or self._timed_steps == 0:
            return 0.0
        return self._timed_steps / (time.perf_counter() - self._t0)

    def examples_per_s(self, batch_size: int) -> float:
        return self.steps_per_s() * batch_size


def compiled_cost(fn, *args, **kwargs) -> dict:
    """FLOPs / bytes-accessed estimates from the compiled executable."""
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0] if analysis else {}
    return {k: analysis.get(k) for k in ("flops", "bytes accessed")
            if analysis and k in analysis}
