"""Test harness: force an 8-device virtual CPU platform so sharding tests run
without TPU hardware (SURVEY.md §4 item 3).

The environment may pre-set JAX_PLATFORMS and pre-import jax via
sitecustomize, so override both the env var and the live config before any
backend initialises.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()
