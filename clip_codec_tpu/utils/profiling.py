"""Tracing / profiling (SURVEY.md §5): jax.profiler + step-time helpers.

The reference's only tracing is tqdm progress bars and a TensorBoard writer
in the SD path (``train/sd_diffusion_train.py:51,183``); here the standard
TPU toolchain: Perfetto/TensorBoard traces via ``jax.profiler`` plus a tiny
step timer for throughput logging.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace", with_perfetto: bool = False) -> Iterator[None]:
    """Capture a profiler trace around a block::

        with trace("/tmp/t"):
            step_fn(...).block_until_ready()

    View with TensorBoard (profile plugin) or ui.perfetto.dev."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=with_perfetto)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timing with compile-step exclusion."""

    def __init__(self, skip_first: int = 1) -> None:
        self.skip_first = skip_first
        self._seen = 0
        self._total = 0.0
        self._last: Optional[float] = None

    def __enter__(self):
        self._last = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - (self._last or 0.0)
        self._seen += 1
        if self._seen > self.skip_first:
            self._total += dt
        return False

    @property
    def mean_s(self) -> float:
        counted = max(self._seen - self.skip_first, 1)
        return self._total / counted
