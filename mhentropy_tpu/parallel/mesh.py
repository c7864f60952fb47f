"""Device mesh + sharding policy.

The reference is single-process single-GPU (SURVEY.md §2.3 — no DP/TP/PP of
any kind); this module is the TPU-native scaling design that replaces that
absence: a 2-D (data, hypo) mesh over ICI where

* training shards the image batch over 'data' (plain data parallelism —
  gradients all-reduce over ICI, inserted by the partitioner),
* multi-hypothesis inference additionally shards the N-hypothesis axis over
  'hypo' (the model is tiny, N is the scaling axis: N=200 eval hypotheses
  per image spread across chips; per-image features are broadcast once),
* optionally the TrainState itself shards over 'data' (`fsdp_sharding` —
  ZeRO-3: params/moments partitioned, XLA inserts all-gathers and
  reduce-scatters; `engine.make_train_step(..., fsdp=True)`).

Everything uses jit + NamedSharding + with_sharding_constraint — XLA inserts
the collectives.
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
HYPO_AXIS = "hypo"


def make_mesh(n_devices: int | None = None, hypo: int = 1, devices=None) -> Mesh:
    """A (data, hypo) mesh. hypo=1 gives pure data parallelism."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if len(devices) < n_devices:
        raise ValueError(
            f"make_mesh: need {n_devices} devices, have {len(devices)} "
            f"(backend {jax.default_backend()!r}). For host-side testing run "
            "under JAX_PLATFORMS=cpu "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n_devices} "
            "in a process whose PYTHONPATH does not pull in a hardware-plugin "
            "sitecustomize."
        )
    devices = devices[:n_devices]
    assert n_devices % hypo == 0, (n_devices, hypo)
    shape = (n_devices // hypo, hypo)
    try:
        # Topology-aware layout: enumeration-order reshape puts mesh
        # neighbours on devices that need not be ICI neighbours, so
        # collectives over 'data'/'hypo' would cross non-adjacent links
        # on a real slice. create_device_mesh degrades to the plain
        # reshape on hosts/CPU.
        from jax.experimental import mesh_utils

        grid = mesh_utils.create_device_mesh(shape, devices=devices)
    except Exception:
        grid = np.asarray(devices).reshape(shape)
    return Mesh(grid, (DATA_AXIS, HYPO_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis over 'data'; replicated over 'hypo'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def hypo_batch_spec() -> P:
    """PartitionSpec for (N, B, ...) hypothesis-major tensors."""
    return P(HYPO_AXIS, DATA_AXIS)


def shard_batch(mesh: Mesh, tree):
    """Device-put a host batch with the leading axis sharded over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def fsdp_sharding(mesh: Mesh, tree, min_size: int = 4096):
    """Per-leaf NamedShardings that shard each large array over 'data'
    (ZeRO-3 / FSDP layout: parameters, gradients and optimizer moments all
    live partitioned; XLA inserts the all-gathers before use and
    reduce-scatters after the backward — the scaling-book recipe, no manual
    collectives).

    Each leaf's LARGEST dim divisible by the data-axis size is sharded;
    leaves smaller than `min_size` elements (biases, BN vectors, scalars)
    stay replicated — sharding them would cost more in latency-bound
    collectives than the bytes saved.

    Apply to a TrainState template: the optimizer moments (optax mirrors
    the param pytree) pick up the identical layout automatically.
    """
    n = mesh.shape[DATA_AXIS]

    def leaf(x):
        shape = getattr(x, "shape", ())
        size = int(np.prod(shape)) if shape else 0
        if n == 1 or size < min_size:
            return NamedSharding(mesh, P())
        for d in sorted(range(len(shape)), key=lambda d: shape[d],
                        reverse=True):
            if shape[d] % n == 0:
                spec = [None] * len(shape)
                spec[d] = DATA_AXIS
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(leaf, tree)


def shard_tree(tree, shardings):
    """Device-put a host pytree onto per-leaf shardings (e.g. from
    fsdp_sharding)."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), tree, shardings
    )


def pad_batch(batch_size: int, n_devices: int) -> int:
    """Round the batch up so it divides the data axis."""
    return int(math.ceil(batch_size / n_devices) * n_devices)


def fit_devices(batch_size: int, hypo: int = 1, n_available: int | None = None) -> int:
    """Largest usable device count: a multiple of `hypo` whose data axis
    divides the batch."""
    if n_available is None:
        n_available = len(jax.devices())
    for n in range(n_available, 0, -1):
        if n % hypo == 0 and batch_size % (n // hypo) == 0:
            return n
    return hypo
