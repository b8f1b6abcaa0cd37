"""Tracing / profiling utilities (SURVEY.md §5 "Tracing / profiling").

The reference imports torch.profiler but leaves it dormant, keeping only
data/batch step timing (``src/trainer.py:455,480-508``).  TPU equivalents:

* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-compatible trace directory,
* :func:`annotate` — named trace regions,
* :class:`StepTimer` — the reference's data_time/batch_time counters.

Enable in the train CLI with ``--profile-dir``; the first N steps after
warmup are captured.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    if not log_dir:
        yield
        return
    import jax

    logging.info("capturing jax profiler trace to %s", log_dir)
    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Named region visible in the trace viewer."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """data_time / batch_time accounting matching the reference's counters."""

    def __init__(self):
        self._end = time.time()
        self.data_time = 0.0
        self.batch_time = 0.0

    def data_ready(self) -> None:
        self.data_time = time.time() - self._end

    def step_done(self) -> None:
        now = time.time()
        self.batch_time = now - self._end
        self._end = now
