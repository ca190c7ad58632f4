"""Tracing / profiling hooks.

The reference has no profiler integration — only per-iteration timing and
max-memory logging (SURVEY.md section 5; trainer_sparse3d.py:74,119-143).
Here we expose the JAX profiler plus named-scope helpers so every phase
of the pipeline shows up in a TensorBoard/XProf trace, and a
block-until-ready timer for honest step timing.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def named_scope(name: str):
    """Annotate a region so it is visible in profiler traces."""
    return jax.named_scope(name)


class StepTimer:
    """Wall-clock timer that blocks on device completion."""

    def __init__(self):
        self.t0: Optional[float] = None

    def start(self):
        self.t0 = time.time()

    def stop(self, *arrays) -> float:
        for a in arrays:
            jax.block_until_ready(a)
        dt = time.time() - self.t0
        self.t0 = None
        return dt


def device_memory_stats():
    """Per-device memory stats (the reference logs
    torch.cuda.max_memory_allocated, trainer_sparse3d.py:141)."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
