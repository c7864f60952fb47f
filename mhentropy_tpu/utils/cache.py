"""Persistent XLA compilation cache.

Compiles on this platform go through a remote-compile relay and take minutes
for large programs; caching them on disk makes every process after the first
start instantly. Call once before building jitted functions.
"""

from __future__ import annotations

import hashlib
import os
import re


def _machine_key() -> str:
    """The raw identity string hashed by cpu_fingerprint (separate for
    testability)."""
    parts = []
    # Host identity first: /proc/cpuinfo model+flags proved INSUFFICIENT
    # in round 3 — two fleet machines shared a cpuinfo fingerprint while
    # their XLA target configs differed (e.g. +prefer-no-gather), so the
    # loader rejected every entry with `cpu_aot_loader ... machine type
    # mismatch` warnings that it may SIGILL. /etc/machine-id is unique
    # per installed host and catches exactly the machine swap cpuinfo
    # missed.
    try:
        parts.append(open("/etc/machine-id").read().strip())
    except OSError:
        pass
    try:
        txt = open("/proc/cpuinfo").read()
        model = re.search(r"model name\s*:\s*(.*)", txt)
        flags = re.search(r"flags\s*:\s*(.*)", txt)
        parts.append("%s|%s" % (model.group(1) if model else "",
                                flags.group(1) if flags else ""))
    except OSError:  # non-Linux fallback: coarse but stable
        import platform

        parts.append(platform.platform() + platform.processor())
    # Serialized-executable format is a jax/jaxlib implementation detail;
    # version bumps must also roll the cache.
    try:
        import jax
        import jaxlib

        parts.append(f"jax={jax.__version__}|jaxlib={jaxlib.__version__}")
    except Exception:
        pass
    return "\n".join(parts)


def cpu_fingerprint() -> str:
    """Short hash identifying (machine, CPU, jax version) for cache keying.

    XLA:CPU serialises AOT executables compiled for the EXACT feature set
    of the compiling host; loading them on a host with different features
    logs `cpu_aot_loader ... machine type mismatch` and can SIGSEGV/SIGILL
    at execution (observed in anger: a fleet-machine swap segfaulted the
    test suite mid-run from a cache written by the previous host). Key
    every persistent cache directory on this fingerprint so a host change
    degrades to a cold cache, never to loading incompatible code.
    """
    return hashlib.sha1(_machine_key().encode()).hexdigest()[:10]


def enable_compilation_cache(path: str = "/root/.jax_compile_cache") -> None:
    """Point jax's persistent compile cache at a per-(machine, backend)
    directory.

    The BACKEND split is load-bearing, not cosmetic: under the axon TPU
    plugin, compilation goes through the remote relay, and entries
    written in an axon process carry the RELAY server's CPU feature set
    (+prefer-no-gather, amx-avx512, ...). A later CPU-backend process
    (the multichip dryrun child) sharing the same directory then loads
    alien AOT code that `cpu_aot_loader` warns may SIGILL — this, not a
    fleet-machine swap, is where the r3 MULTICHIP tail's aot errors came
    from (reproduced r4: a bench.py axon run re-polluted a freshly wiped
    dir within the same machine)."""
    try:
        import jax

        path = f"{path}-{cpu_fingerprint()}-{jax.default_backend()}"
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        # Same serialization config as tests/conftest.py ("all" is what
        # makes CPU executables serialize at all). KNOWN RESIDUE, r4:
        # programs containing gather/scatter ops are AOT-compiled with
        # XLA's +prefer-no-gather/scatter TUNING pseudo-features baked
        # into the target, and the loader then rejects exactly those
        # entries in any later process with a `cpu_aot_loader ...
        # machine type mismatch ... may SIGILL` ERROR line — an XLA
        # self-inconsistency (same machine, same backend, same config;
        # 14 such lines per warm dryrun, everything else loads, warm is
        # still ~2x faster than cold). Graceful: a rejected entry is
        # recompiled, never executed. Distinguish this benign residue
        # from the r3 cross-machine/cross-backend hazards, which the
        # fingerprint + backend-split DO eliminate.
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:
        pass  # older jax or read-only fs: compile as usual
