"""Test harness: force an 8-device virtual CPU platform so sharding tests run
without TPU hardware (SURVEY.md §4 item 3).

The environment may pre-set JAX_PLATFORMS and pre-import jax via
sitecustomize, so override both the env var and the live config before any
backend initialises.
"""

import os

import re

os.environ["JAX_PLATFORMS"] = "cpu"
# Rewrite (not just append) the device-count flag: a leaked ambient value
# (e.g. =4 from another tool) would otherwise survive and fail the
# device_count assert below for the whole suite.
flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
               os.environ.get("XLA_FLAGS", ""))
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=8"
).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite is compile-dominated on this 1-core
# box; caching XLA executables across runs cuts repeat wall time sharply.
# (CPU executables only serialise with xla_caches="all"; min_compile_time 0
# is required for entries to be written on the CPU backend.)
# The dir is keyed on the host CPU fingerprint: loading AOT CPU executables
# cached by a different fleet machine SIGSEGVs (see utils/cache.py).
from mhentropy_tpu.utils.cache import cpu_fingerprint  # noqa: E402

_cache_dir = os.environ.get("MHENT_TEST_CACHE_DIR") or os.path.join(
    os.path.dirname(__file__), os.pardir,
    f".jax_test_cache-{cpu_fingerprint()}")
try:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception as e:
    # Loud, not silent: without the persistent cache every run is a cold
    # run (~43 min vs ~17 on this box). Keep running, but say why.
    import sys as _sys

    print(f"\n[conftest] WARNING: persistent compile cache NOT configured "
          f"({e!r}) — this jax dropped a config knob; expect cold-run "
          f"wall times", file=_sys.stderr)

# Bound how many executables ONE process serialises into the cache. The r3
# full suite segfaulted inside XLA's `executable.serialize()` (3/3 runs on
# the driver machine, always after ~6,000 cold-cache writes at 94% of the
# suite; the same test serialises fine solo). Cap writes per process well
# under that: a cold run caches the first CAP programs and merely skips
# caching the rest, so the next run warms further — self-healing across
# runs, zero cost once warm.
# Observable patch state, pinned by tests/test_conftest_guards.py so a jax
# upgrade that drops the private hook fails VISIBLY instead of silently
# walking the suite back toward the mmap cliff.
CACHE_WRITE_GUARD = {
    "patched": False,
    "writes": 0,
    "cap": int(os.environ.get("MHENT_CACHE_WRITE_CAP", "2500")),
}
try:
    import jax._src.compilation_cache as _cc

    _orig_put = _cc.put_executable_and_time

    def _bounded_put(*args, **kwargs):
        CACHE_WRITE_GUARD["writes"] += 1
        if CACHE_WRITE_GUARD["writes"] > CACHE_WRITE_GUARD["cap"]:
            if CACHE_WRITE_GUARD["writes"] == CACHE_WRITE_GUARD["cap"] + 1:
                print(f"\n[conftest] persistent-cache write cap "
                      f"({CACHE_WRITE_GUARD['cap']}) reached; later compiles "
                      f"run uncached this process (next run warms them)")
            return None
        return _orig_put(*args, **kwargs)

    _cc.put_executable_and_time = _bounded_put
    CACHE_WRITE_GUARD["patched"] = True
except Exception as e:
    import sys as _sys

    print(f"\n[conftest] WARNING: cache write cap NOT installed ({e!r}) — "
          f"jax moved jax._src.compilation_cache.put_executable_and_time; "
          f"an unbounded cold run previously segfaulted in native "
          f"serialize at ~6,000 writes (see CLAUDE.md r3/r4 notes)",
          file=_sys.stderr)

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()


import sys  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _bound_process_mmap_count():
    """Clear jax's executable caches when the process nears the kernel's
    vm.max_map_count limit (65,530 here).

    Root cause of the r3/r4 full-suite segfaults (4 crashed runs, three
    distinct victims — a cache-write serialize, two compiles): every live
    XLA:CPU executable holds ~3 mmaps (measured), the suite compiles or
    deserializes ~6,400 programs plus thousands of interpret-mode Pallas
    subprograms, and once the process map table is near the limit the
    next native allocation inside LLVM/XLA dies with SIGSEGV instead of
    a clean error. jax.clear_caches() releases the maps (verified:
    1364 -> 467 after 300 compiles). Clearing is triggered by the live
    map count, not a schedule, because a clear also drops TRACED
    lowerings — retracing the big step programs costs 20-60 s each on
    this 1-core box, so we only pay it when actually approaching the
    cliff. Threshold 50k: observed single-test bursts stay under ~8k
    (kernel-module setups), so 50k + burst < 65,530, while a 40k
    threshold cleared ~4x per suite and the retrace storms added ~10
    min of warm wall."""
    yield
    try:
        with open("/proc/self/maps", "rb") as f:
            n = sum(1 for _ in f)
    except OSError:  # non-Linux: nothing to bound
        return
    if n > 50000:
        import gc

        jax.clear_caches()
        gc.collect()


@pytest.fixture(autouse=True)
def _close_leaked_experiments():
    """Sweep Experiment logging sinks after every test.

    Each Experiment holds a tensorboardX writer (one thread + one
    multiprocessing queue) and a FileHandler; tests that build experiments
    and drop them leaked those across the whole suite process — 17 live
    TB event-writer threads were present at the point the r3 suite
    segfaulted inside XLA executable serialization. Import lazily: most
    tests never touch the engine and should not pay its import.
    """
    yield
    eng = sys.modules.get("mhentropy_tpu.train.engine")
    if eng is not None:
        eng.close_all_experiments()


def pytest_collection_modifyitems(config, items):
    """Run the Pallas/Mosaic kernel test files FIRST.

    Every observed full-suite crash (3 judge runs r3 + 1 cold run r4; all
    on this machine) died compiling or serializing a Mosaic interpret-mode
    program ~290 tests into the process (test_stem_int8 / test_stem_pallas
    — alphabetically last among the kernel files), while the same files
    pass in a fresh process with a cold cache (minimal repro, r4). The
    trigger is accumulated native process state, not the programs
    themselves — so run the heavy Mosaic compiles when the process is
    young. Stable sort: relative order within each group is unchanged.
    """
    early = ("test_stage1_int8", "test_stage1_pallas", "test_stage2_int8",
             "test_stem_int8", "test_stem_pallas", "test_pallas_sampler",
             "test_pallas_sampler_int8", "test_pallas_glow_sampler",
             "test_lbs_pallas")
    items.sort(key=lambda it: 0 if any(e in it.nodeid for e in early) else 1)
