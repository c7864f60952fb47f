"""Fused Pallas kernel: draw all N hypotheses through the 12-layer coupling
stack in one pass (SURVEY.md §7 item 2 / BASELINE north star component).

Design (see /opt/skills/guides/pallas_guide.md):

* Rows are grouped image-major; `images_per_tile` images (x N hypotheses
  each) form one row tile, so each image's conditioning projections (4, H)
  are loaded once per (chunk, layer) grid step and broadcast across its
  hypothesis rows — no per-row gather and no (N x B x L x H) materialised
  cond tensor.
* grid = (B/images_per_tile, L) with the layer axis minor. TPU grids run
  sequentially, so the hypothesis tile lives in VMEM scratch that persists
  across the L layer steps: z0 is read at l == 0, the transformed tile and
  its forward log-determinant are written at l == L-1. Between steps only the
  layer's weights stream HBM -> VMEM (double-buffered by the BlockSpec
  pipeline). The tile size trades weight re-streaming (small tiles) against
  VMEM pressure from the (rows, H) activations (large tiles).
* The coupling math (mask split, two 3-layer MLPs, tanh/leaky-relu, affine
  update, logdet accumulation) stays fused in VMEM between the matmuls —
  the XLA scan materialises x between layers.
* D=45 is padded to the 128-lane width with mask=1 on padded dims, which
  makes them exact pass-throughs (no s/t contribution, zero logdet).

Numerically equivalent to flows.realnvp.forward; the wrapper reorders
to/from the reference's hypothesis-major layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mhentropy_tpu.flows import realnvp
from mhentropy_tpu.flows import pallas_common
from mhentropy_tpu.flows.pallas_common import LANE, VMEM_BYTES, round_up
from mhentropy_tpu.flows.priors import std_normal_logp
from mhentropy_tpu.flows.realnvp import RealNVPConfig, RealNVPParams

_round_up = round_up  # shared scaffolding (flows/pallas_common.py)


def pack_weights(params: RealNVPParams, cfg: RealNVPConfig, dtype=jnp.float32):
    """Pad D to the lane width and bundle per-layer weights for the kernel."""
    d, L = cfg.dim, cfg.n_layers
    dp = _round_up(d, LANE)

    pad_rows, pad_cols, pad_bias_d = pallas_common.lane_pad_helpers(
        d, dp, dtype)

    masks = jnp.pad(params.masks, ((0, 0), (0, dp - d)), constant_values=1.0)
    return {
        "masks": masks[:, None, :],  # (L, 1, Dp)
        "s_w0": pad_rows(params.s_w0), "s_b0": params.s_b0[:, None, :],
        "s_w1": params.s_w1.astype(dtype), "s_b1": params.s_b1[:, None, :],
        "s_w2": pad_cols(params.s_w2), "s_b2": pad_bias_d(params.s_b2),
        "t_w0": pad_rows(params.t_w0), "t_b0": params.t_b0[:, None, :],
        "t_w1": params.t_w1.astype(dtype), "t_b1": params.t_b1[:, None, :],
        "t_w2": pad_cols(params.t_w2), "t_b2": pad_bias_d(params.t_b2),
    }, dp


def _kernel(
    z0_ref, cproj_ref, masks_ref,
    s_w0_ref, s_b0_ref, s_w1_ref, s_b1_ref, s_w2_ref, s_b2_ref,
    t_w0_ref, t_b0_ref, t_w1_ref, t_b1_ref, t_w2_ref, t_b2_ref,
    x_out_ref, logdet_ref,
    x_scratch, ld_scratch,
    *, n_layers: int,
):
    import jax.experimental.pallas as pl

    l = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        x_scratch[:] = z0_ref[0]
        ld_scratch[:] = jnp.zeros_like(ld_scratch)

    mask = masks_ref[0]  # (1, Dp); broadcasts over (ipt, R, Dp)
    x = x_scratch[:]
    x_masked = x * mask
    dtype = s_w0_ref.dtype

    def mlp(w0, b0, c0, w1, b1, c1, w2, b2, squash):
        hh = jnp.dot(
            x_masked.astype(dtype), w0, preferred_element_type=jnp.float32
        ) + b0 + c0
        hh = jnp.where(hh > 0, hh, 0.01 * hh)
        hh = jnp.dot(hh.astype(dtype), w1, preferred_element_type=jnp.float32)
        hh = hh + b1 + c1
        hh = jnp.where(hh > 0, hh, 0.01 * hh)
        out = jnp.dot(hh.astype(dtype), w2, preferred_element_type=jnp.float32) + b2
        return jnp.tanh(out) if squash else out

    cp = cproj_ref[0]  # (ipt, 4, H); slice (not index) -> (ipt, 1, H) bcasts
    s = mlp(s_w0_ref[0], s_b0_ref[0], cp[:, 0:1, :], s_w1_ref[0], s_b1_ref[0],
            cp[:, 1:2, :], s_w2_ref[0], s_b2_ref[0], True)
    t = mlp(t_w0_ref[0], t_b0_ref[0], cp[:, 2:3, :], t_w1_ref[0], t_b1_ref[0],
            cp[:, 3:4, :], t_w2_ref[0], t_b2_ref[0], False)
    inv_mask = 1.0 - mask
    s = s * inv_mask
    t = t * inv_mask
    x_scratch[:] = x_masked + inv_mask * (x * jnp.exp(s) + t)
    ld_scratch[:] = ld_scratch[:] + s

    @pl.when(l == n_layers - 1)
    def _():
        x_out_ref[0] = x_scratch[:]
        logdet_ref[0] = ld_scratch[:]


@functools.partial(jax.jit, static_argnames=("n_layers", "h"))
def _fused_transform(packed: dict, z0_tiles, cproj_layers, n_layers: int, h: int):
    """z0_tiles: (C, ipt, R, Dp) image chunks; cproj_layers: (L, B, 4, H).

    Returns (x (C, ipt, R, Dp), logdet (C, ipt, R)).
    """
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
            w_spec((1, dp)),
            w_spec((dp, h)), w_spec((1, h)),
            w_spec((h, h)), w_spec((1, h)),
            w_spec((h, dp)), w_spec((1, dp)),
            w_spec((dp, h)), w_spec((1, h)),
            w_spec((h, h)), w_spec((1, h)),
            w_spec((h, dp)), w_spec((1, dp)),
        ],
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
        z0_tiles,
        cproj_layers,
        packed["masks"],
        packed["s_w0"], packed["s_b0"], packed["s_w1"], packed["s_b1"],
        packed["s_w2"], packed["s_b2"],
        packed["t_w0"], packed["t_b0"], packed["t_w1"], packed["t_b1"],
        packed["t_w2"], packed["t_b2"],
    )
    return x_out, jnp.sum(logdet, axis=-1)


def auto_images_per_tile(cfg: RealNVPConfig, rows: int, weight_dtype,
                         requested: int) -> int:
    """Largest tile that fits VMEM: double-buffered layer weights + the
    x/logdet scratch + the (rows, H) activation temporaries per image."""
    dp = _round_up(cfg.dim, LANE)
    h = cfg.h_dim
    itemsize = jnp.dtype(weight_dtype).itemsize
    w_layer = (dp * h + h * h + h * dp) * 2 * itemsize  # s and t nets
    budget = VMEM_BYTES - 2 * w_layer - 4 * 1024 * 1024
    per_image = rows * (2 * dp * 4 + h * 4)  # scratch x2 + activations (f32)
    return max(1, min(requested, budget // per_image))


def sample_fused(
    params: RealNVPParams,
    cfg: RealNVPConfig,
    key: jax.Array,
    feat: jax.Array,
    n: int,
    temp: float = 0.7,
    return_log_prob: bool = False,
    images_per_tile: int = 8,
    weight_dtype=jnp.float32,
):
    """Drop-in fused replacement for flows.realnvp.sample over N hypotheses.

    temp default matches realnvp.sample's (0.7): every "same key -> same
    samples" path must agree even for callers that rely on defaults
    (production callers all pass temp explicitly).

    Args:
        feat: (B, C) per-image conditioning features; B must divide into
            images_per_tile chunks (padded internally otherwise).
        weight_dtype: bf16 halves the weight streaming and doubles MXU
            throughput at ~1e-2 sample precision — fine for hypothesis
            generation, keep f32 where log-density parity matters.

    Returns:
        x: (n * B, D) hypothesis-major rows (reference layout); optionally
        with (n * B,) log densities.
    """
    if cfg.dim in (2, 3):
        # Per-joint modelling: make_cond returns B*joint_n cond rows while
        # this kernel's tile layout assumes B rows — silently wrong
        # conditioning, so refuse loudly (the XLA path handles these dims).
        raise NotImplementedError(
            "fused sampler does not support per-joint flows (dim in {2,3})"
        )
    b = feat.shape[0]
    d = cfg.dim
    r = _round_up(n, 8)
    ipt = min(auto_images_per_tile(cfg, r, weight_dtype, images_per_tile), b)
    b_pad = _round_up(b, ipt)
    packed, dp = pack_weights(params, cfg, dtype=weight_dtype)
    cond = realnvp.make_cond(params, cfg, feat)
    cproj = realnvp.cond_cache(params, cfg, cond)  # (L, 4, B, H)
    cproj_layers = jnp.transpose(cproj, (0, 2, 1, 3))  # (L, B, 4, H)
    if b_pad != b:
        cproj_layers = jnp.pad(cproj_layers, ((0, 0), (0, b_pad - b), (0, 0), (0, 0)))

    # Draw EXACTLY like realnvp.sample (the caller's key, (n*b, d)
    # hypothesis-major rows): same key -> same hypotheses on the fused
    # and XLA paths, so toggling use_pallas_sampler (or the backend auto
    # gate) never changes a seeded run's samples. Regroup image-major
    # for the kernel; padded rows carry zeros (outputs discarded).
    z0_rows = jax.random.normal(key, (n * b, d)) * temp
    z0 = jnp.transpose(z0_rows.reshape(n, b, d), (1, 0, 2))
    z0 = jnp.pad(z0, ((0, b_pad - b), (0, r - n), (0, 0)))
    z0_tiles = jnp.pad(z0, ((0, 0), (0, 0), (0, dp - d))).reshape(
        b_pad // ipt, ipt, r, dp
    )
    x_tiles, logdet = _fused_transform(
        packed, z0_tiles, cproj_layers, cfg.n_layers, cfg.h_dim
    )
    x_tiles = x_tiles.reshape(b_pad, r, dp)[:b, :n, :d]
    logdet = logdet.reshape(b_pad, r)[:b, :n]

    # image-major -> (n*B, D) hypothesis-major (the reference layout).
    x = jnp.transpose(x_tiles, (1, 0, 2)).reshape(n * b, d)
    if return_log_prob:
        lp = std_normal_logp(z0[:b, :n]) - logdet
        return x, jnp.transpose(lp, (1, 0)).reshape(n * b)
    return x


def supported() -> bool:
    return jax.default_backend() == "tpu"

# ---------------------------------------------------------------------------
# Differentiable wrapper: forward runs the fused kernel, backward is the VJP
# of the equivalent XLA scan recomputed from residuals (rematerialisation —
# the custom-VJP pattern from the Pallas guide). Training can therefore use
# the kernel too; gradients are the exact XLA f32 gradients.
# ---------------------------------------------------------------------------


def _xla_equivalent(params: RealNVPParams, cfg: RealNVPConfig,
                    z0_tiles: jax.Array, cproj: jax.Array):
    """The scan-path computation matching _fused_transform's contract.

    z0_tiles: (B, R, D) image-major; cproj: (L, 4, B, H).
    Returns (x (B, R, D), logdet (B, R)).
    """
    b, r, d = z0_tiles.shape
    rows = z0_tiles.reshape(b * r, d)
    cproj_rows = jnp.repeat(cproj, r, axis=2)  # image-major row alignment
    x, logdet = realnvp.forward(params, cfg, rows, cproj_rows)
    return x.reshape(b, r, d), logdet.reshape(b, r)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4))
def transform_diff(params: RealNVPParams, cfg: RealNVPConfig,
                   z0_tiles: jax.Array, cproj: jax.Array,
                   images_per_tile: int = 16):
    """Differentiable base->data transform; kernel forward, XLA backward.

    Args:
        z0_tiles: (B, R, D) image-major base samples.
        cproj: (L, 4, B, H) per-image conditioning cache.

    Returns:
        (x (B, R, D), logdet (B, R)).
    """
    return _kernel_transform(params, cfg, z0_tiles, cproj, images_per_tile)


def _kernel_transform(params, cfg, z0_tiles, cproj, images_per_tile):
    b, r, d = z0_tiles.shape
    ipt = min(auto_images_per_tile(cfg, _round_up(r, 8), jnp.float32,
                                   images_per_tile), b)
    b_pad = _round_up(b, ipt)
    rp = _round_up(r, 8)
    packed, dp = pack_weights(params, cfg)
    z = jnp.pad(z0_tiles, ((0, b_pad - b), (0, rp - r), (0, dp - d)))
    cproj_layers = jnp.transpose(cproj, (0, 2, 1, 3))  # (L, B, 4, H)
    cproj_layers = jnp.pad(cproj_layers, ((0, 0), (0, b_pad - b), (0, 0), (0, 0)))
    x, logdet = _fused_transform(
        packed, z.reshape(b_pad // ipt, ipt, rp, dp), cproj_layers,
        cfg.n_layers, cfg.h_dim,
    )
    x = x.reshape(b_pad, rp, dp)[:b, :r, :d]
    return x, logdet.reshape(b_pad, rp)[:b, :r]


def _transform_fwd(params, cfg, z0_tiles, cproj, images_per_tile):
    out = _kernel_transform(params, cfg, z0_tiles, cproj, images_per_tile)
    return out, (params, z0_tiles, cproj)


def _transform_bwd(cfg, images_per_tile, residuals, cotangents):
    params, z0_tiles, cproj = residuals
    _, vjp = jax.vjp(
        lambda p, z, c: _xla_equivalent(p, cfg, z, c), params, z0_tiles, cproj
    )
    return vjp(cotangents)


transform_diff.defvjp(_transform_fwd, _transform_bwd)


def sample_fused_diff(
    params: RealNVPParams,
    cfg: RealNVPConfig,
    key: jax.Array,
    feat: jax.Array,
    n: int,
    temp: float = 0.7,
    images_per_tile: int = 16,
):
    """Differentiable sample_and_log_prob: Pallas forward, XLA-remat backward.
    Returns hypothesis-major (x (n*B, D), log_prob (n*B,)). temp default
    matches realnvp.sample's."""
    if cfg.dim in (2, 3):
        raise NotImplementedError(
            "fused sampler does not support per-joint flows (dim in {2,3})"
        )
    b = feat.shape[0]
    d = cfg.dim
    cond = realnvp.make_cond(params, cfg, feat)
    cproj = realnvp.cond_cache(params, cfg, cond)
    # Draw EXACTLY like realnvp.sample ((n*b, d) hypothesis-major rows,
    # same as sample_fused): same key -> same hypotheses whichever path
    # runs, so toggling use_pallas_sampler never changes a seeded
    # training run. Regroup image-major for the kernel.
    z0_rows = jax.random.normal(key, (n * b, d)) * temp
    z0 = jnp.transpose(z0_rows.reshape(n, b, d), (1, 0, 2))
    x_tiles, logdet = transform_diff(params, cfg, z0, cproj, images_per_tile)
    x = jnp.transpose(x_tiles, (1, 0, 2)).reshape(n * b, d)
    lp = jnp.transpose(std_normal_logp(z0) - logdet, (1, 0)).reshape(n * b)
    return x, lp
