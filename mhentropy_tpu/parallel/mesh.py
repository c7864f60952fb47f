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
  reduce-scatters; `engine.make_train_step(..., fsdp=True)`),
* optionally the model itself shards over a third 'model' axis
  (`tp_sharding` — Megatron-style tensor parallelism: column-parallel
  first linear / row-parallel second linear per MLP pair, channel-parallel
  conv1 + input-channel-parallel conv2 per residual block; XLA inserts the
  one psum per pair; `engine.make_train_step(..., tp=True)`).

Everything uses jit + NamedSharding + with_sharding_constraint — XLA inserts
the collectives.
"""

from __future__ import annotations

import warnings

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
HYPO_AXIS = "hypo"
MODEL_AXIS = "model"
PIPE_AXIS = "pipe"


def make_mesh(n_devices: int | None = None, hypo: int = 1, tp: int = 1,
              pp: int = 1, devices=None) -> Mesh:
    """A (data, hypo, model, pipe) mesh. hypo=tp=pp=1 gives pure data
    parallelism (the extra size-1 axes are free — specs that never name
    them replicate over them). 'pipe' carries the GPipe flow-stack
    pipeline (parallel/pipeline.py)."""
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
    grp = hypo * tp * pp
    if n_devices % grp != 0:
        # Friendly (and -O-proof) like the shortage error above; a bare
        # assert vanished under python -O and surfaced as an opaque
        # numpy reshape error.
        raise ValueError(
            f"make_mesh: hypo*tp*pp = {hypo}*{tp}*{pp} = {grp} does not "
            f"divide n_devices={n_devices}; pick sizes whose product "
            f"divides the device count (fit_devices helps)")
    shape = (n_devices // grp, hypo, tp, pp)
    try:
        # Topology-aware layout: enumeration-order reshape puts mesh
        # neighbours on devices that need not be ICI neighbours, so
        # collectives over 'data'/'hypo' would cross non-adjacent links
        # on a real slice. create_device_mesh degrades to the plain
        # reshape on hosts/CPU.
        from jax.experimental import mesh_utils

        grid = mesh_utils.create_device_mesh(shape, devices=devices)
    except Exception as e:
        if jax.default_backend() != "cpu":
            # Expected only on CPU hosts; on a real slice the fallback IS
            # the non-topology-aware layout the comment above warns about,
            # so make the bandwidth regression visible.
            warnings.warn(
                f"create_device_mesh failed on backend "
                f"{jax.default_backend()!r} ({e!r}); falling back to "
                "enumeration-order reshape — collectives may cross "
                "non-adjacent ICI links.")
        grid = np.asarray(devices).reshape(shape)
    return Mesh(grid, (DATA_AXIS, HYPO_AXIS, MODEL_AXIS, PIPE_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis over 'data'; replicated over 'hypo'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def hypo_batch_spec() -> P:
    """PartitionSpec for (N, B, ...) hypothesis-major tensors."""
    return P(HYPO_AXIS, DATA_AXIS)


def shard_batch(mesh: Mesh, tree):
    """Device-put a host batch with the leading axis sharded over 'data'.

    ONE device_put for the whole tree: a per-leaf tree_map costs a relay
    dispatch per target field (~20 fields/batch, milliseconds each
    through the axon relay — the tax multihost.global_batch_from_local
    documents and avoids)."""
    sh = batch_sharding(mesh)
    return jax.device_put(tree, jax.tree_util.tree_map(
        lambda _: sh, tree))


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

    (Thin alias of `state_sharding(fsdp=True)` — one copy of the leaf
    rule.)
    """
    return state_sharding(mesh, tree, fsdp=True, min_size=min_size)


def _tp_spec(path: str, shape, n: int) -> P | None:
    """Megatron-style PartitionSpec for one parameter leaf, or None.

    Pairs are chosen so each MLP costs exactly one psum (after the
    row-parallel member) and every residual/block boundary stays
    replicated:

    * RealNVP stacked couplings (flows/realnvp.py RealNVPParams,
      (L, in, out) kernels): `*_w0`/`*_c0` column-parallel into the hidden
      (+ their biases), `*_w1` row-parallel out of it; `*_w2` (H→45) and
      the layer-1 cond fusions stay replicated — their outputs are tiny.
    * Glow ResidualNet blocks (flows/glow.py): `l0` column-parallel into
      the hidden, `l1` row-parallel back toward the residual stream; the
      per-block `ctx` projection is the GLU gate multiplied onto l1's
      OUTPUT (glow.py ~:200), so sharding it over 'model' costs one
      collective per block to align the gate with the post-psum stream
      (correct, but not psum-free — measured fine at these tiny dims);
      actnorm/LULinear/initial/final replicated (45-dim).
    * ResNet residual blocks (flax dicts, HWIO kernels): `conv1`
      output-channel-parallel with its `bn1` scale/bias sharded to match,
      `conv2` input-channel-parallel (the contraction is over channels, so
      a channel-sharded activation psums back to replicated); `conv3`/
      downsample/stem replicated. Running batch_stats stay replicated.
    * det_head: `l0` column- / `l1` row-parallel.
    """
    nd = len(shape)

    def div(d):
        return shape[d] % n == 0

    if "batch_stats" in path:
        return None
    # --- RealNVP stacked couplings -----------------------------------
    if nd == 3 and div(2) and any(
        path.endswith(k) for k in (".s_w0", ".t_w0", ".s_c0", ".t_c0")
    ):
        return P(None, None, MODEL_AXIS)
    if nd == 2 and div(1) and any(
        path.endswith(k) for k in (".s_b0", ".t_b0", ".s_cb0", ".t_cb0")
    ):
        return P(None, MODEL_AXIS)
    if nd == 3 and div(1) and any(
        path.endswith(k) for k in (".s_w1", ".t_w1")
    ):
        return P(None, MODEL_AXIS, None)
    # --- Glow ResidualNet blocks --------------------------------------
    if "'blocks'" in path and "'coupling'" in path:
        if nd == 2 and div(1) and (
            "'l0'" in path or "'ctx'" in path
        ) and path.endswith("'w']"):
            return P(None, MODEL_AXIS)
        if nd == 1 and div(0) and (
            "'l0'" in path or "'ctx'" in path
        ) and path.endswith("'b']"):
            return P(MODEL_AXIS)
        if nd == 2 and div(0) and "'l1'" in path and path.endswith("'w']"):
            return P(MODEL_AXIS, None)
        return None
    # --- ResNet residual blocks ---------------------------------------
    if "'layer" in path and "backbone" in path:
        if nd == 4 and div(3) and "'conv1'" in path:
            return P(None, None, None, MODEL_AXIS)
        if nd == 1 and div(0) and "'bn1'" in path:
            return P(MODEL_AXIS)
        if nd == 4 and div(2) and "'conv2'" in path:
            return P(None, None, MODEL_AXIS, None)
        return None
    # --- det head ------------------------------------------------------
    if "det_head" in path:
        if nd == 2 and div(1) and "'l0'" in path and path.endswith("'w']"):
            return P(None, MODEL_AXIS)
        if nd == 1 and div(0) and "'l0'" in path and path.endswith("'b']"):
            return P(MODEL_AXIS)
        if nd == 2 and div(0) and "'l1'" in path and path.endswith("'w']"):
            return P(MODEL_AXIS, None)
    return None


def tp_sharding(mesh: Mesh, tree):
    """Per-leaf NamedShardings for Megatron-style tensor parallelism over
    the 'model' axis (see `_tp_spec` for the layout). Leaves the rules
    don't claim stay replicated. Matching is by key-path suffix, so the
    same rules cover a bare params tree, a TrainState, and the optax
    moment mirrors inside it.

    (Thin alias of `state_sharding(tp=True)` — one copy of the leaf
    rule, same as fsdp_sharding.)"""
    return state_sharding(mesh, tree, tp=True)


def state_sharding(mesh: Mesh, tree, fsdp: bool = False, tp: bool = False,
                   min_size: int = 4096):
    """Combined TrainState layout: tensor-parallel specs first (`tp`),
    then ZeRO-3 sharding over 'data' (`fsdp`) on whatever dims the TP
    rule left unsharded — large TP-sharded leaves pick up a second axis
    (2-D sharding), everything else falls back to the plain fsdp rule."""
    n_d = mesh.shape[DATA_AXIS]
    n_m = mesh.shape[MODEL_AXIS]

    def leaf(path, x):
        shape = getattr(x, "shape", ())
        size = int(np.prod(shape)) if shape else 0
        spec = list(_tp_spec(jax.tree_util.keystr(path), shape, n_m) or
                    [None] * len(shape)) if (tp and n_m > 1) else \
            [None] * len(shape)
        if fsdp and n_d > 1 and size >= min_size:
            for d in sorted(range(len(shape)), key=lambda d: shape[d],
                            reverse=True):
                if spec[d] is None and shape[d] % n_d == 0:
                    spec[d] = DATA_AXIS
                    break
        while spec and spec[-1] is None:  # P(None,..) == P() semantically;
            spec.pop()                    # keep the canonical spelling
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(leaf, tree)


def shard_tree(tree, shardings):
    """Device-put a host pytree onto per-leaf shardings (e.g. from
    fsdp_sharding)."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), tree, shardings
    )


def fit_devices(batch_size: int, hypo: int = 1, tp: int = 1,
                pp: int = 1, n_available: int | None = None) -> int:
    """Largest usable device count: a multiple of `hypo*tp*pp` whose data
    axis divides the batch. Never exceeds n_available — an over-subscribed
    hypo*tp*pp is reported here, not as a confusing make_mesh error."""
    if n_available is None:
        n_available = len(jax.devices())
    grp = hypo * tp * pp
    if grp > n_available:
        raise ValueError(
            f"fit_devices: hypo*tp*pp = {hypo}*{tp}*{pp} = {grp} exceeds "
            f"the {n_available} available device(s)")
    for n in range(n_available, 0, -1):
        if n % grp == 0 and batch_size % (n // grp) == 0:
            return n
    raise AssertionError("unreachable: n=grp always satisfies the loop")
