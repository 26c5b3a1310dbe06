"""Profiling helpers.

Reference parity (SURVEY.md section 5 tracing row): the reference prints
wall-clock deltas through its logger; we add (a) stage timers that force
device synchronization (a scalar readback — `block_until_ready` does not
reliably fence on remote-tunnel platforms) and (b) a `jax.profiler` trace
context for XLA-level inspection.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from spim_registration_tpu.utils.log import get_logger

logger = get_logger("profile")


def device_fence(x) -> None:
    """Reliably wait for `x` (a jax array) to be computed."""
    jnp.sum(x).item()


@contextlib.contextmanager
def stage_timer(name: str, timings: Optional[Dict[str, float]] = None,
                fence=None):
    """Time a stage; pass `fence=<output array>` via the returned setter to
    synchronize before stopping the clock."""
    holder = {}

    def set_fence(arr):
        holder["out"] = arr
        return arr

    t0 = time.time()
    try:
        yield set_fence
    finally:
        if "out" in holder:
            device_fence(holder["out"])
        dt = time.time() - t0
        logger.info("%s: %.3fs", name, dt)
        if timings is not None:
            timings[name] = timings.get(name, 0.0) + dt


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """jax.profiler trace (view with tensorboard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
