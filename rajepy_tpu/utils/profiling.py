"""Tracing and per-kernel timing.

The reference's only instrumentation is a wall-clock log line around the
fill-factor computation (classes.py:655, 743-750; SURVEY §5.1).  Here:

* :class:`KernelTimer` — context manager timing a device computation with a
  completion barrier, optionally logged through a ``rajepy_tpu.utils.Log``;
* :func:`trace` — context manager wrapping ``jax.profiler`` so a pipeline
  stage can be captured for TensorBoard/Perfetto with one line;
* :func:`timed_call` — time a jitted callable's steady-state execution.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


class KernelTimer:
    """``with KernelTimer("fill factors", log) as t: ...`` — logs the
    elapsed wall time with a device sync at exit."""

    def __init__(self, name: str, log=None, result=None):
        self.name = name
        self.log = log
        self.elapsed: Optional[float] = None
        self._result = result

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def set_result(self, result):
        """Register device output(s) to block on before stopping the
        clock."""
        self._result = result

    def __exit__(self, exc_type, exc, tb):
        if self._result is not None:
            jax.block_until_ready(self._result)
        self.elapsed = time.perf_counter() - self._t0
        if self.log is not None and exc_type is None:
            self.log.add_entry(
                "INFO", f"[timing] {self.name}: {self.elapsed:.3f}s",
                timestamp=False)
        return False


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace of the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_call(fn: Callable, *args, n_rep: int = 3, **kwargs):
    """(result, seconds-per-call) for the steady state of a jitted
    callable: one warm-up call, then ``n_rep`` timed calls with a final
    barrier."""
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out, (time.perf_counter() - t0) / n_rep
