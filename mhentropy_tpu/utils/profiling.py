"""Tracing / profiling / sanitiser harness (SURVEY.md §5 row 1-2).

The reference has no profiling (only a commented set_detect_anomaly,
run.py:10). The TPU build supplies: jax.profiler trace capture, a
block_until_ready timing harness with a hypotheses/sec/chip counter (the
BASELINE.json metric), and the functional-purity sanitisers (jax_debug_nans /
jax_debug_infs toggles) that replace torch's anomaly detection.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def nan_sanitizer(enable: bool = True):
    """Raise on NaN/Inf production anywhere in jitted code — the functional
    equivalent of torch.autograd.set_detect_anomaly."""
    prev_nan = jax.config.jax_debug_nans
    prev_inf = jax.config.jax_debug_infs
    jax.config.update("jax_debug_nans", enable)
    jax.config.update("jax_debug_infs", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev_nan)
        jax.config.update("jax_debug_infs", prev_inf)


def time_fn(fn, *args, iters: int = 20, warmup: int = 2):
    """Median-free simple wall timing with device sync.

    Returns:
        (seconds_per_call, last_result).
    """
    result = None
    for _ in range(warmup):
        result = fn(*args)
    jax.block_until_ready(result)
    t0 = time.perf_counter()
    for _ in range(iters):
        result = fn(*args)
    jax.block_until_ready(result)
    return (time.perf_counter() - t0) / iters, result


def hypotheses_per_sec(fn, *args, n_hypotheses: int, batch: int,
                       iters: int = 20) -> float:
    """The BASELINE.json throughput metric for a sampling step."""
    sec, _ = time_fn(fn, *args, iters=iters)
    return n_hypotheses * batch / sec
