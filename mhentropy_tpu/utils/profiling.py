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


def _default_vary(args):
    """Per-iteration input variation: nudge the first floating array arg.

    The axon relay serves repeated identical (program, args) executions
    from a cache — fixed-input timing loops report impossible numbers
    (CLAUDE.md "Measurement gotchas", measured r2: resnet50 fwd "0.14 ms"
    = 6x over v5e peak). Every timing call must therefore be a distinct
    execution."""
    import jax.numpy as jnp

    idx = next(
        (
            i
            for i, a in enumerate(args)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        ),
        None,
    )
    if idx is None:
        # Integer-array fallback: nudge by (i+1) instead of silently
        # replaying identical args — fixed inputs are served from the
        # relay's execution cache and time as ~0 (the r2 "0.14 ms
        # resnet50" hazard this helper exists to prevent).
        iidx = next(
            (
                i
                for i, a in enumerate(args)
                if hasattr(a, "dtype")
                and jnp.issubdtype(a.dtype, jnp.integer)
                and not jnp.issubdtype(a.dtype, jnp.bool_)
            ),
            None,
        )
        if iidx is None:
            raise ValueError(
                "time_fn: no array argument to vary per call — fixed "
                "(program, args) pairs are served from the relay's "
                "execution cache and time as ~0; pass vary= explicitly "
                "if this backend genuinely has no such cache"
            )

        def vary_int(i, a):
            x = a[iidx]
            # Wrapping add keeps u8 pixel semantics valid and varies
            # every element.
            return (a[:iidx]
                    + ((x + x.dtype.type((i % 3) + 1)).astype(x.dtype),)
                    + a[iidx + 1:])

        return vary_int

    def vary(i, a):
        x = a[idx]
        return a[:idx] + (x + x.dtype.type((i + 1) * 1e-6),) + a[idx + 1:]

    return vary


def time_fn(fn, *args, iters: int = 20, warmup: int = 2, vary=None):
    """Simple wall timing with device sync and per-call input variation
    (see `_default_vary` — fixed inputs are served from the relay's
    execution cache and time as ~0). Pass `vary=(lambda i, args: args)`
    only on backends without an execution cache.

    Returns:
        (seconds_per_call, last_result).
    """
    if vary is None:
        vary = _default_vary(args)
    result = None
    for i in range(warmup):
        result = fn(*vary(-1 - i, args))
    jax.block_until_ready(result)
    t0 = time.perf_counter()
    for i in range(iters):
        result = fn(*vary(i, args))
    jax.block_until_ready(result)
    return (time.perf_counter() - t0) / iters, result


def hypotheses_per_sec(fn, *args, n_hypotheses: int, batch: int,
                       iters: int = 20) -> float:
    """The BASELINE.json throughput metric for a sampling step."""
    sec, _ = time_fn(fn, *args, iters=iters)
    return n_hypotheses * batch / sec


def _scan_harness(fn, steps: int):
    """The canonical relay-safe scan: per-step varied first arg (else XLA
    hoists the body out of the scan) and the FULL output reduced into the
    carry (else XLA prunes the network) — both CLAUDE.md measurement
    rules. One copy; the probes in tools/ dispatch through here."""
    import jax.numpy as jnp

    @jax.jit
    def scan(args, key):
        def body(carry, k):
            x0 = args[0]
            if jnp.issubdtype(x0.dtype, jnp.floating):
                x0 = x0 + (jax.random.uniform(k, (1,), jnp.float32)
                           * 1e-3).astype(x0.dtype)
            else:
                # Integer inputs (int8 kernels, u8 transport): a float
                # perturbation truncates to 0 and the body hoists out of
                # the scan (the CLAUDE.md 438k->"832k" class). Wrapping
                # integer nudge instead.
                x0 = (x0 + jax.random.randint(
                    k, (1,), 1, 4, jnp.int32).astype(x0.dtype)
                ).astype(x0.dtype)
            varied = (x0,) + tuple(args[1:])
            out = fn(*varied)
            return carry + jnp.sum(out.astype(jnp.float32)) * 1e-20, None

        acc, _ = jax.lax.scan(body, 0.0, jax.random.split(key, steps))
        return acc

    return scan


def traced_scan(fn, args, key, steps: int = 20):
    """Run `steps` executions of fn inside ONE jitted lax.scan (for xplane
    profiling or as a single timed dispatch)."""
    return _scan_harness(fn, steps)(tuple(args), key)


def scan_seconds_per_step(fn, args, key, steps: int = 30, rounds: int = 3):
    """Best-of-rounds wall seconds per step of fn inside the scan harness
    (jitted once; each round uses a distinct key)."""
    scan = _scan_harness(fn, steps)
    args = tuple(args)
    jax.block_until_ready(scan(args, key))
    best = float("inf")
    for r in range(rounds):
        t0 = time.perf_counter()
        jax.block_until_ready(scan(args, jax.random.fold_in(key, r)))
        best = min(best, (time.perf_counter() - t0) / steps)
    return best
