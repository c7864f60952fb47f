"""Multi-host input pipeline: per-host dataset sharding + global-array
assembly.

The reference is single-process (SURVEY.md §2.3); this is the TPU-native
scale-out design for pod slices: each host reads only its slice of the
dataset and the per-host arrays are stitched into one globally-sharded
jax.Array with `make_array_from_process_local_data` — data rides the hosts'
NICs once and lands directly on the host's local chips (no gather through
host 0).

Single-process behaviour is the identity (process_count == 1), so the same
loop runs everywhere from a dev box to a v5e pod.
"""

from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mhentropy_tpu.parallel import mesh as mesh_lib


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed bring-up (no-op when already initialised). On TPU
    pods the arguments auto-detect from the environment.

    MUST run before any JAX computation. The initialised check is
    jax.distributed.is_initialized(), NOT a jax.process_count() probe —
    process_count() itself initialises the backend, after which
    jax.distributed.initialize() always raises; with that exception
    swallowed, a pod would silently run as N independent single-process
    instances (the bug this replaces).
    """
    if jax.distributed.is_initialized():
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        if (coordinator_address is not None or num_processes is not None
                or process_id is not None):
            # Explicit multi-host bring-up must not silently degrade to
            # a single-process run. `is not None`, NOT truthiness:
            # process_id=0 (host 0 of every pod) is falsy.
            raise
        # Auto-detect on a single-process dev box: run undistributed —
        # but NOT when the environment says this is a real MULTI-host
        # cluster: swallowing a transient coordinator failure there would
        # silently degrade the pod to N independent single-process runs,
        # the exact bug this function was rewritten to eliminate.
        # Multi-host signals only: an explicit coordinator address, or a
        # comma-separated TPU_WORKER_HOSTNAMES list (the axon relay's
        # sitecustomize sets TPU_WORKER_HOSTNAMES=localhost on this
        # SINGLE-host box — a bare single entry is not a pod).
        if any(os.environ.get(v) for v in (
                "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                "MEGASCALE_COORDINATOR_ADDRESS")):
            raise
        if "," in os.environ.get("TPU_WORKER_HOSTNAMES", ""):
            raise


def host_shard_indices(n: int, process_index: int | None = None,
                       process_count: int | None = None) -> np.ndarray:
    """Contiguous per-host index slice, padded by wrapping so every host
    serves the same count (static shapes across hosts are required — a
    ragged final host would deadlock the collectives). The wrapped
    duplicates are flagged by host_shard_valid so eval metrics never
    count a sample twice."""
    return _host_slice(n, process_index, process_count)[0]


def host_shard_valid(n: int, process_index: int | None = None,
                     process_count: int | None = None) -> np.ndarray:
    """Boolean mask over host_shard_indices: False where the slice wrapped
    past the dataset end (pure padding for shape parity across hosts)."""
    return _host_slice(n, process_index, process_count)[1]


def wrap_padded(n: int, process_count: int) -> bool:
    """True when ANY host's shard wraps (ceil(n/pc)*pc != n). Depends only
    on global facts, never on process_index — key-presence decisions made
    from this are identical on every host (the r5 fix: a local
    local_valid.all() test diverged the target pytree structure across
    hosts whenever only the last host wrapped)."""
    return (-(-n // process_count)) * process_count != n


def _host_slice(n, process_index, process_count):
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per_host = -(-n // pc)  # ceil
    pos = np.arange(pi * per_host, (pi + 1) * per_host)
    return pos % n, pos < n


def global_batch_from_local(mesh: Mesh, local_tree, spec: P | None = None):
    """Assemble host-local numpy batches into one globally-sharded jax.Array
    pytree. The local leading axis must be global_batch / process_count."""
    spec = spec if spec is not None else P(mesh_lib.DATA_AXIS)
    sharding = NamedSharding(mesh, spec)
    local_tree = jax.tree_util.tree_map(np.asarray, local_tree)
    if jax.process_count() == 1:
        # ONE device_put dispatch for the whole tree (a per-leaf tree_map
        # costs a relay dispatch per target field — the same ~20-dispatch
        # tax data/common.batches' collation removed).
        return jax.device_put(local_tree, sharding)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_tree,
    )


def multihost_batches(
    dataset,
    global_batch_size: int,
    mesh: Mesh,
    shuffle: bool = False,
    seed: int = 0,
    pad_remainder: bool = True,
):
    """Yield globally-sharded (image, target) batches where each host only
    touched its own slice of the dataset.

    Every host must iterate in lockstep (same seed -> same order); the
    per-host loader is data.common.batches over the host's index shard.
    """
    from mhentropy_tpu.data import common as data_common

    pc = jax.process_count()
    assert global_batch_size % pc == 0, (global_batch_size, pc)
    local_bs = global_batch_size // pc

    n = (dataset.images.shape[0] if hasattr(dataset, "images")
         else len(dataset))
    order = np.arange(n)
    if shuffle:
        np.random.RandomState(seed).shuffle(order)
    local_idx, local_valid = _host_slice(len(order), None, None)
    local_order = order[local_idx]
    # HOST-INDEPENDENT wrap predicate: deciding key presence from THIS
    # host's local_valid made the target pytree structure diverge across
    # hosts whenever only the last host wrapped (n % pc != 0) — different
    # compiled programs per process, a pod hang with collectives inside
    # the step. Every host computes the same global fact.
    # Derived from the slice LAYOUT (per_host is identical on every host
    # by construction), so a test-patched _host_slice stays consistent.
    any_host_wraps = len(local_idx) * pc != len(order)

    view = _IndexedView(dataset, local_order)
    pos = 0
    for batch in data_common.batches(
        view, local_bs, shuffle=False, pad_remainder=pad_remainder,
        drop_remainder=not pad_remainder, to_device=False,
    ):
        image, target = batch[0], batch[1]
        # Fold the cross-host wrap padding (host_shard_valid) into the
        # per-batch 'valid' mask, so pod eval never counts the
        # shape-parity duplicates. batches() iterates the view
        # sequentially, so batch rows are view positions [pos, pos + B)
        # (its own tail padding is already valid=0). Applied in BOTH
        # pad_remainder modes: when per_host divides local_bs the wrap
        # duplicates land in full (never-dropped) batches, so
        # pad_remainder=False still needs the mask.
        rows = np.arange(pos, pos + image.shape[0])
        in_range = rows < len(local_valid)
        vrow = np.where(
            in_range,
            local_valid[np.minimum(rows, len(local_valid) - 1)],
            False,
        ).astype(np.float32)
        # Key-presence is decided up front from the HOST-INDEPENDENT
        # wrap predicate (any wrap duplicate anywhere -> every batch on
        # EVERY host carries 'valid'), because (a) a mid-epoch pytree
        # structure change would retrace the jitted eval step — minutes
        # through the remote-compile relay on a real pod — and (b) a
        # cross-host structure mismatch compiles different programs per
        # process. Caveat: when no host wraps and the underlying loader's
        # pad_remainder path adds 'valid' only to its own final padded
        # batch, that tail batch still introduces the key once (one
        # retrace, at most once per stream, identical on every host).
        if "valid" in target or any_host_wraps:
            target = dict(target)
            target["valid"] = (
                np.asarray(target.get("valid", 1.0), np.float32) * vrow)
        pos += image.shape[0]
        yield global_batch_from_local(mesh, (image, target))


class _IndexedView:
    """len/__getitem__ adapter exposing a permuted subset of a dataset."""

    def __init__(self, dataset, indices: np.ndarray):
        self._ds = dataset
        self._idx = np.asarray(indices)
        self._array_backed = hasattr(dataset, "images")

    def __len__(self):
        return len(self._idx)

    def __getitem__(self, i: int):
        j = int(self._idx[i])
        if self._array_backed:
            return (
                self._ds.images[j],
                {k: v[j] for k, v in self._ds.targets.items()},
            )
        return self._ds[j]
