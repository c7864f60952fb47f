"""int8 (W8A8) fused RealNVP sampler: the quantized counterpart of
flows/pallas_sampler.py, following models/quant.py's static-PTQ scheme.

Why: with the encoder quantized (models/quant.py + stage1_int8), the
bf16 fused sampler (326 us at ~66% MXU) is one of the largest remaining
items of the quantized eval step, and it is MXU-bound — exactly where
int8 pays on this hardware (kernel int8 dots measured 1.30x over bf16
dots in the same kernel, tools/mosaic_int8_probe; docs/PERF.md). int8
weights also halve the per-layer HBM streaming (786 KB vs 1.57 MB).

Scheme (mirrors models/quant.py):
  - Weights: symmetric per-output-column int8 per coupling layer,
    s_w[l, j] = max|W[l, :, j]| / 127 for each of the 6 GEMMs
    (s/t nets x 3 layers).
  - Activations: symmetric per-tensor-per-site int8 with static scales
    calibrated on representative features (max|x| at each GEMM input,
    collected by an instrumented float forward). The coupling input
    x*mask is shared by the s and t nets -> one scale per layer.
  - Requantization folds into the epilogue: the GEMM-k output is scaled
    by (s_act * s_wcol * inv_next) so the next quantize is a plain
    round/clip of the leaky-relu (positive scaling commutes with
    leaky-relu). The x-path biases and the conditioning projections are
    pre-scaled into the cond cache ONCE per image (f32, outside the
    kernel), so the kernel epilogue is a single fused multiply-add.
  - The affine coupling update (exp(s), masked blend) and the logdet
    stay f32 in VMEM scratch, exactly like the bf16 kernel.

Mosaic gotchas honoured (CLAUDE.md): quantize in f32 VPU math BEFORE
any MXU op (int8 values <= 127 are bf16-exact); int8 dots accumulate via
preferred_element_type=int32 (K=512 max-abs products sum to ~8e6, far
inside i32).

Reference parity: the same coupling math as /root/reference/hand/
flows.py:210-217 quantized per the PTQ scheme; interpret-mode tests pin
the kernel to an XLA emulation of the identical quantized arithmetic,
and on-chip parity runs through tools/sampler_tpu_check.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mhentropy_tpu.flows import realnvp
from mhentropy_tpu.flows import pallas_common
from mhentropy_tpu.flows.pallas_common import LANE, round_up
from mhentropy_tpu.flows.priors import std_normal_logp
from mhentropy_tpu.flows.pallas_sampler import auto_images_per_tile
from mhentropy_tpu.flows.realnvp import RealNVPConfig, RealNVPParams

_PREC = jax.lax.Precision.HIGH


class FlowQTree(NamedTuple):
    """Quantized sampler tree (a pytree: fine as a jit argument)."""

    masks: jax.Array   # (L, 1, Dp) f32 {0,1} with 1s on the lane padding
    qm: jax.Array      # (L, 1, Dp) f32 = masks * inv_a0[l] (quantize+mask)
    s_w0: jax.Array    # (L, Dp, H) int8
    s_e0: jax.Array    # (L, 1, H) f32 epilogue scale (incl. requant fold)
    s_w1: jax.Array    # (L, H, H) int8
    s_e1: jax.Array    # (L, 1, H)
    s_w2: jax.Array    # (L, H, Dp) int8
    s_e2: jax.Array    # (L, 1, Dp)
    s_b2: jax.Array    # (L, 1, Dp) f32
    t_w0: jax.Array
    t_e0: jax.Array
    t_w1: jax.Array
    t_e1: jax.Array
    t_w2: jax.Array
    t_e2: jax.Array
    t_b2: jax.Array
    cond_scale: jax.Array  # (L, 4) f32: per-slot cond-cache rescale
    cond_bias: jax.Array   # (L, 4, H) f32: folded x-path biases * inv


# ---------------------------------------------------------------------------
# Calibration: per-layer activation amaxes from an instrumented float forward
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg",))
def collect_act_maxabs(params: RealNVPParams, cfg: RealNVPConfig,
                       z: jax.Array, cproj: jax.Array) -> dict:
    """Float forward (realnvp.forward semantics) collecting max|input| at
    every quantized GEMM site.

    Args:
        z: (R, D) base samples (drawn like the production sampler).
        cproj: (L, 4, R, H) conditioning cache rows aligned with z.

    Returns:
        dict of (L,) arrays: a0 (coupling input, shared by s/t), and the
        post-leaky-relu hidden amaxes s_h1, s_h2, t_h1, t_h2.
    """
    conditional = cfg.effective_cond_dim() > 0
    layers = realnvp._layer_tree(params)

    def body(carry, inp):
        x = carry
        layer, cp = inp
        mask = layer.masks
        x_masked = x * mask

        def mlp(w0, b0, w1, b1, w2, b2, c0, c1, squash):
            h = jnp.dot(x_masked, w0, precision=_PREC) + b0
            if conditional:
                h = h + c0
            h1 = jax.nn.leaky_relu(h, 0.01)
            h = jnp.dot(h1, w1, precision=_PREC) + b1
            if conditional:
                h = h + c1
            h2 = jax.nn.leaky_relu(h, 0.01)
            out = jnp.dot(h2, w2, precision=_PREC) + b2
            return (jnp.tanh(out) if squash else out,
                    jnp.max(jnp.abs(h1)), jnp.max(jnp.abs(h2)))

        s, s_h1, s_h2 = mlp(layer.s_w0, layer.s_b0, layer.s_w1, layer.s_b1,
                            layer.s_w2, layer.s_b2, cp[0], cp[1], True)
        t, t_h1, t_h2 = mlp(layer.t_w0, layer.t_b0, layer.t_w1, layer.t_b1,
                            layer.t_w2, layer.t_b2, cp[2], cp[3], False)
        inv_mask = 1.0 - mask
        x = x_masked + inv_mask * (x * jnp.exp(s * inv_mask) + t * inv_mask)
        stats = (jnp.max(jnp.abs(x_masked)), s_h1, s_h2, t_h1, t_h2)
        return x, stats

    _, (a0, s_h1, s_h2, t_h1, t_h2) = jax.lax.scan(
        body, z, (layers, cproj))
    return {"a0": a0, "s_h1": s_h1, "s_h2": s_h2,
            "t_h1": t_h1, "t_h2": t_h2}


def _colscale(w):  # (L, K, N) -> per-column scale (L, 1, N), zero-safe
    s = jnp.max(jnp.abs(w), axis=1, keepdims=True) / 127.0
    return jnp.where(s > 0, s, 1.0).astype(jnp.float32)


def _q8(w, s):
    return jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)


def prepare_flow(params: RealNVPParams, cfg: RealNVPConfig,
                 act: dict) -> FlowQTree:
    """Quantize the coupling weights and fold the requant chain into
    epilogue vectors, consuming `collect_act_maxabs` amaxes."""
    d, L = cfg.dim, cfg.n_layers
    dp = round_up(d, LANE)
    f32 = jnp.float32

    def safe(v):  # (L,) amax -> (L,) scale, zero-safe
        s = jnp.asarray(v, f32) / 127.0
        return jnp.where(s > 0, s, 1.0)

    a0 = safe(act["a0"])
    sh = {k: safe(act[k]) for k in ("s_h1", "s_h2", "t_h1", "t_h2")}

    pad_rows, pad_cols, pad_bias_d = pallas_common.lane_pad_helpers(d, dp)

    def net(prefix):
        w0 = pad_rows(getattr(params, f"{prefix}_w0").astype(f32))
        w1 = getattr(params, f"{prefix}_w1").astype(f32)
        w2 = pad_cols(getattr(params, f"{prefix}_w2").astype(f32))
        c0, c1, c2 = _colscale(w0), _colscale(w1), _colscale(w2)
        h1, h2 = sh[f"{prefix}_h1"], sh[f"{prefix}_h2"]
        e0 = a0[:, None, None] * c0 / h1[:, None, None]
        e1 = h1[:, None, None] * c1 / h2[:, None, None]
        e2 = h2[:, None, None] * c2
        return (_q8(w0, c0), e0, _q8(w1, c1), e1, _q8(w2, c2), e2,
                pad_bias_d(getattr(params, f"{prefix}_b2")))

    s_w0, s_e0, s_w1, s_e1, s_w2, s_e2, s_b2 = net("s")
    t_w0, t_e0, t_w1, t_e1, t_w2, t_e2, t_b2 = net("t")
    masks = jnp.pad(params.masks, ((0, 0), (0, dp - d)), constant_values=1.0)
    inv_a0 = 1.0 / a0
    # Cond-cache fold: slot k of the (L, 4, B, H) cache is rescaled by the
    # requant inv of the GEMM it feeds, with the x-path bias folded in.
    cond_scale = jnp.stack(
        [1.0 / sh["s_h1"], 1.0 / sh["s_h2"],
         1.0 / sh["t_h1"], 1.0 / sh["t_h2"]], axis=1)  # (L, 4)
    cond_bias = jnp.stack(
        [params.s_b0 / sh["s_h1"][:, None],
         params.s_b1 / sh["s_h2"][:, None],
         params.t_b0 / sh["t_h1"][:, None],
         params.t_b1 / sh["t_h2"][:, None]], axis=1)  # (L, 4, H)
    return FlowQTree(
        masks=masks[:, None, :].astype(f32),
        qm=(masks * inv_a0[:, None])[:, None, :].astype(f32),
        s_w0=s_w0, s_e0=s_e0, s_w1=s_w1, s_e1=s_e1, s_w2=s_w2, s_e2=s_e2,
        s_b2=s_b2,
        t_w0=t_w0, t_e0=t_e0, t_w1=t_w1, t_e1=t_e1, t_w2=t_w2, t_e2=t_e2,
        t_b2=t_b2,
        cond_scale=cond_scale.astype(f32), cond_bias=cond_bias.astype(f32),
    )


def scale_cond_cache(ftree: FlowQTree, cproj_layers: jax.Array) -> jax.Array:
    """(L, B, 4, H) cond cache -> pre-scaled/biased kernel cond input."""
    return (cproj_layers * ftree.cond_scale[:, None, :, None]
            + ftree.cond_bias[:, None, :, :])


# ---------------------------------------------------------------------------
# The quantized coupling math, shared verbatim by the kernel and the XLA
# emulation the tests pin it against.
# ---------------------------------------------------------------------------


def _quant_layer(x, mask, qm, cp, wq, *, int8_ops: bool):
    """One quantized coupling layer on (..., Dp) rows.

    Args:
        cp: per-slot cond values pre-scaled by `scale_cond_cache`,
            sliceable as cp[k] with shape broadcastable to (..., H).
        wq: this layer's (s_w0, s_e0, ..., t_b2) tuple.
        int8_ops: True inside the kernel (int8 dot operands, i32
            accumulate); False for a pure-f32 emulation of identical
            values (round/clip still applied — exact on CPU).
    """
    s_w0, s_e0, s_w1, s_e1, s_w2, s_e2, s_b2, \
        t_w0, t_e0, t_w1, t_e1, t_w2, t_e2, t_b2 = wq
    f32 = jnp.float32

    def quant(v):
        q = jnp.clip(jnp.round(v), -127.0, 127.0)
        return q.astype(jnp.int8) if int8_ops else q

    def dot(a, w):
        if int8_ops:
            return jnp.dot(a, w, preferred_element_type=jnp.int32
                           ).astype(f32)
        return jnp.dot(a, w.astype(f32), precision=_PREC)

    xq = quant(x * qm)

    def mlp(w0, e0, c0, w1, e1, c1, w2, e2, b2, squash):
        h = dot(xq, w0) * e0 + c0
        h = jnp.where(h > 0, h, 0.01 * h)
        h = dot(quant(h), w1) * e1 + c1
        h = jnp.where(h > 0, h, 0.01 * h)
        out = dot(quant(h), w2) * e2 + b2
        return jnp.tanh(out) if squash else out

    s = mlp(s_w0, s_e0, cp[0], s_w1, s_e1, cp[1], s_w2, s_e2, s_b2, True)
    t = mlp(t_w0, t_e0, cp[2], t_w1, t_e1, cp[3], t_w2, t_e2, t_b2, False)
    inv_mask = 1.0 - mask
    s = s * inv_mask
    t = t * inv_mask
    return x * mask + inv_mask * (x * jnp.exp(s) + t), s


def xla_forward_q(ftree: FlowQTree, cfg: RealNVPConfig, z: jax.Array,
                  cprojq: jax.Array):
    """XLA emulation of the kernel's exact quantized arithmetic (test
    oracle + CPU fallback). z: (B, R, Dp) image-major padded rows;
    cprojq: (L, B, 4, H) pre-scaled cond. Returns (x, logdet (B, R))."""
    x = z
    logdet = jnp.zeros(z.shape[:2], jnp.float32)
    names = ("s_w0", "s_e0", "s_w1", "s_e1", "s_w2", "s_e2", "s_b2",
             "t_w0", "t_e0", "t_w1", "t_e1", "t_w2", "t_e2", "t_b2")
    for l in range(cfg.n_layers):
        wq = tuple(getattr(ftree, nm)[l] for nm in names)
        cp = cprojq[l][:, :, None, :]  # (B, 4, 1, H): cp[k] broadcasts
        cp = tuple(cp[:, k] for k in range(4))
        x, s = _quant_layer(x, ftree.masks[l], ftree.qm[l], cp, wq,
                            int8_ops=False)
        logdet = logdet + jnp.sum(s, axis=-1)
    return x, logdet


# ---------------------------------------------------------------------------
# The Pallas kernel: same grid/pipeline as pallas_sampler._fused_transform
# ---------------------------------------------------------------------------


def _kernel(z0_ref, cproj_ref, masks_ref, qm_ref,
            s_w0_ref, s_e0_ref, s_w1_ref, s_e1_ref, s_w2_ref, s_e2_ref,
            s_b2_ref,
            t_w0_ref, t_e0_ref, t_w1_ref, t_e1_ref, t_w2_ref, t_e2_ref,
            t_b2_ref,
            x_out_ref, logdet_ref, x_scratch, ld_scratch, *, n_layers: int):
    import jax.experimental.pallas as pl

    l = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        x_scratch[:] = z0_ref[0]
        ld_scratch[:] = jnp.zeros_like(ld_scratch)

    cp_all = cproj_ref[0]  # (ipt, 4, H)
    cp = tuple(cp_all[:, k:k + 1, :] for k in range(4))  # (ipt, 1, H) each
    wq = (s_w0_ref[0], s_e0_ref[0], s_w1_ref[0], s_e1_ref[0],
          s_w2_ref[0], s_e2_ref[0], s_b2_ref[0],
          t_w0_ref[0], t_e0_ref[0], t_w1_ref[0], t_e1_ref[0],
          t_w2_ref[0], t_e2_ref[0], t_b2_ref[0])
    x, s = _quant_layer(x_scratch[:], masks_ref[0], qm_ref[0], cp, wq,
                        int8_ops=True)
    x_scratch[:] = x
    ld_scratch[:] = ld_scratch[:] + s

    @pl.when(l == n_layers - 1)
    def _():
        x_out_ref[0] = x_scratch[:]
        logdet_ref[0] = ld_scratch[:]


@functools.partial(jax.jit, static_argnames=("n_layers", "h"))
def _fused_transform_q(ftree: FlowQTree, z0_tiles, cprojq, n_layers: int,
                       h: int):
    """z0_tiles: (C, ipt, R, Dp); cprojq: (L, B, 4, H) pre-scaled.

    Returns (x (C, ipt, R, Dp), logdet (C, ipt, R))."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c, ipt, r, dp = z0_tiles.shape
    grid = (c, n_layers)

    def chunk_only(ic, il):
        return (ic, 0, 0, 0)

    def layer_chunk(ic, il):
        return (il, ic, 0, 0)

    def layer_only2(ic, il):
        return (il, 0, 0)

    w_spec = lambda shape: pl.BlockSpec((1, *shape), layer_only2,
                                        memory_space=pltpu.VMEM)
    x_out, logdet = pl.pallas_call(
        functools.partial(_kernel, n_layers=n_layers),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ipt, r, dp), chunk_only, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ipt, 4, h), layer_chunk, memory_space=pltpu.VMEM),
            w_spec((1, dp)),                      # masks
            w_spec((1, dp)),                      # qm
            w_spec((dp, h)), w_spec((1, h)),      # s_w0, s_e0
            w_spec((h, h)), w_spec((1, h)),       # s_w1, s_e1
            w_spec((h, dp)), w_spec((1, dp)),     # s_w2, s_e2
            w_spec((1, dp)),                      # s_b2
            w_spec((dp, h)), w_spec((1, h)),
            w_spec((h, h)), w_spec((1, h)),
            w_spec((h, dp)), w_spec((1, dp)),
            w_spec((1, dp)),
        ],
        # The logdet emits per-LANE and is reduced over Dp by XLA right
        # after — a Dp-times-oversized output (mirrors the bf16 kernel).
        # Deliberate: the extra write+read is ~2x1.7 MB at the headline
        # shape, ~4 us of HBM time against the sampler's ~330 us phase
        # (<0.25% headline), and an in-kernel cross-lane reduction would
        # need a non-128 trailing output tile. Not worth the churn.
        out_specs=[
            pl.BlockSpec((1, ipt, r, dp), chunk_only, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ipt, r, dp), chunk_only, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, ipt, r, dp), jnp.float32),
            jax.ShapeDtypeStruct((c, ipt, r, dp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((ipt, r, dp), jnp.float32),
            pltpu.VMEM((ipt, r, dp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(
        z0_tiles, cprojq, ftree.masks, ftree.qm,
        ftree.s_w0, ftree.s_e0, ftree.s_w1, ftree.s_e1, ftree.s_w2,
        ftree.s_e2, ftree.s_b2,
        ftree.t_w0, ftree.t_e0, ftree.t_w1, ftree.t_e1, ftree.t_w2,
        ftree.t_e2, ftree.t_b2,
    )
    return x_out, jnp.sum(logdet, axis=-1)


def sample_fused_q(
    params: RealNVPParams,
    cfg: RealNVPConfig,
    ftree: FlowQTree,
    key: jax.Array,
    feat: jax.Array,
    n: int,
    temp: float = 0.7,
    return_log_prob: bool = False,
    images_per_tile: int = 16,
    emulate: bool | None = None,
):
    """int8 drop-in for pallas_sampler.sample_fused: same base-noise draw
    (same key -> same z0 as the bf16/XLA paths), quantized coupling
    transform. The conditioning projections stay f32 (per-image cost
    only; they set the quantized units via scale_cond_cache).

    emulate: run `xla_forward_q` instead of the kernel — bit-equivalent
    quantized math (all intermediate integers are f32-exact), the CPU
    fallback. None (default) = auto: emulate off-TPU.

    Returns hypothesis-major x (n*B, D) [+ log densities of the
    QUANTIZED transform]."""
    if cfg.dim in (2, 3):
        raise NotImplementedError(
            "fused sampler does not support per-joint flows (dim in {2,3})"
        )
    if emulate is None:
        emulate = jax.default_backend() != "tpu"
    b = feat.shape[0]
    d = cfg.dim
    r = round_up(n, 8)
    ipt = min(auto_images_per_tile(cfg, r, jnp.int8, images_per_tile), b)
    b_pad = round_up(b, ipt)
    dp = ftree.masks.shape[-1]

    cond = realnvp.make_cond(params, cfg, feat)
    cproj = realnvp.cond_cache(params, cfg, cond)          # (L, 4, B, H)
    cproj_layers = jnp.transpose(cproj, (0, 2, 1, 3))      # (L, B, 4, H)
    cprojq = scale_cond_cache(ftree, cproj_layers)
    if b_pad != b:
        cprojq = jnp.pad(cprojq, ((0, 0), (0, b_pad - b), (0, 0), (0, 0)))

    z0_rows = jax.random.normal(key, (n * b, d)) * temp
    z0 = jnp.transpose(z0_rows.reshape(n, b, d), (1, 0, 2))
    z0 = jnp.pad(z0, ((0, b_pad - b), (0, r - n), (0, 0)))
    z0_pad = jnp.pad(z0, ((0, 0), (0, 0), (0, dp - d)))
    if emulate:
        x_tiles, logdet = xla_forward_q(ftree, cfg, z0_pad, cprojq)
    else:
        x_tiles, logdet = _fused_transform_q(
            ftree, z0_pad.reshape(b_pad // ipt, ipt, r, dp), cprojq,
            cfg.n_layers, cfg.h_dim,
        )
    x_tiles = x_tiles.reshape(b_pad, r, dp)[:b, :n, :d]
    logdet = logdet.reshape(b_pad, r)[:b, :n]

    x = jnp.transpose(x_tiles, (1, 0, 2)).reshape(n * b, d)
    if return_log_prob:
        lp = std_normal_logp(z0[:b, :n]) - logdet
        return x, jnp.transpose(lp, (1, 0)).reshape(n * b)
    return x


def quantize_sampler(params: RealNVPParams, cfg: RealNVPConfig,
                     feat_calib: jax.Array, key: jax.Array,
                     n: int = 32, temp: float = 0.8) -> FlowQTree:
    """One-call flow-sampler PTQ: draw a calibration trajectory through
    the float flow conditioned on representative features, collect the
    per-site activation amaxes, and build the quantized tree."""
    b = feat_calib.shape[0]
    cond = realnvp.make_cond(params, cfg, feat_calib)
    cproj = realnvp.cond_cache(params, cfg, cond)
    cproj_rows = jnp.tile(cproj, (1, 1, n, 1))
    z0 = jax.random.normal(key, (n * b, cfg.dim)) * temp
    act = collect_act_maxabs(params, cfg, z0, cproj_rows)
    return prepare_flow(params, cfg, jax.device_get(act))


def shape_ok(cfg: RealNVPConfig) -> bool:
    """Structural gate shared with quant.sampler_supported — ONE predicate
    so the next constraint cannot drift between the two (the per-joint
    gate initially landed in the sampler's raise but not the quant gate,
    leaving a window where sampler_supported claimed support and
    sample_fused_q raised). dim in {2,3} = per-joint flows: make_cond
    emits B*joint_n cond rows, incompatible with the B-row tile layout."""
    return cfg.dim <= LANE and cfg.dim not in (2, 3)


def supported(cfg: RealNVPConfig) -> bool:
    return jax.default_backend() == "tpu" and shape_ok(cfg)
