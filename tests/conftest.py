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

_cache_dir = os.path.join(
    os.path.dirname(__file__), os.pardir,
    f".jax_test_cache-{cpu_fingerprint()}")
try:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:
    pass  # older jax: compile as usual

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()
