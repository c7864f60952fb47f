"""Fused Pallas sampler for ConditionalGlow — the ProHMR/Humans flow family
(VERDICT r2 item 7; /root/reference/README.md:26-42 ships only SMPL-flow
weights for this architecture).

One kernel pass drives all N hypotheses through the full stack of glow steps
(actnorm + LU-linear + context-gated residual coupling, base -> data
direction), with the hypothesis tile resident in VMEM across every step and
per-stage weights streamed double-buffered — the same design as
flows/pallas_sampler.py for the RealNVP family, adapted to glow's much
larger per-layer weights (~9 MB at ProHMR shapes: D=144, H=1024, 4 layers x
2 residual blocks):

* Each glow step is split into 5 grid stages so the streamed weight bundle
  stays ~2 MB (one (H, H) residual matmul per stage): [initial+block0.l0],
  [block0.l1+gate], [block1.l0], [block1.l1+gate], [affine+LU+actnorm].
  Stage-invariant inputs map to the same block index across stages, so the
  pipeline fetches them once per step.
* ALL of nflows' index gymnastics are folded into pre-transformed weights on
  the XLA side (`pack_glow_weights`): the identity-split initial matmul
  becomes a full-D matmul with zeroed transform rows; the coupling output's
  (shift | unconstrained-scale) de-interleave + scatter to transform
  positions becomes two pre-permuted (H, D) matmuls; the LU inverse becomes
  one dense (D, D) matmul with the inverse precomputed per layer. The kernel
  is pure matmul + elementwise — nothing data-dependent.
* Per-image context projections (glow._ctx_cache) are computed once per
  image in XLA and broadcast across that image's hypothesis rows in VMEM.
* The log-density's input-independent parts (LU log-diag, actnorm log-scale
  sums) are added in XLA; the kernel accumulates only the per-row coupling
  log-scales.

Numerically equivalent to flows.glow.sample_and_log_prob (same noise in ->
same samples out); parity pinned by tests/test_pallas_glow_sampler.py in
interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mhentropy_tpu.flows import glow
from mhentropy_tpu.flows.glow import GlowConfig
from mhentropy_tpu.flows.pallas_common import LANE, VMEM_BYTES, round_up
from mhentropy_tpu.flows.priors import std_normal_logp

STAGES = 5  # sub-steps per glow layer (see module docstring)

_round_up = round_up  # shared scaffolding (flows/pallas_common.py)


def pack_glow_weights(params: list[dict], cfg: GlowConfig, dtype=jnp.bfloat16):
    """Stack per-layer glow weights into kernel-ready arrays.

    Layers are REVERSED (sampling applies the nflows transform inverse,
    flows/glow.py::forward iterates reversed(params)). Returns (packed dict,
    Dp, per-row-constant logdet term).
    """
    d, h, L = cfg.features, cfg.hidden, cfg.num_layers
    assert cfg.num_blocks == 2, "kernel is specialised to num_blocks=2"
    assert not cfg.use_batch_norm, "BN coupling nets use the XLA path"
    dp = _round_up(d, LANE)
    masks = glow.coupling_masks(d, L)

    big, b_big = [], []
    w_in, b_in = [], []
    w_shift, b_shift, w_scale, b_scale = [], [], [], []
    lu_inv_t, lu_bias = [], []
    an_shift, an_scale, mask_tr = [], [], []
    ld_const = jnp.zeros(())
    for i in reversed(range(L)):
        layer = params[i]
        id_idx, tr_idx = masks[i]
        ni, nt = len(id_idx), len(tr_idx)
        cpl = layer["coupling"]

        # initial Linear's x-half, scattered to full-D rows (zero at
        # transform rows): x_full @ w == x_id @ w_x.
        wi = jnp.zeros((dp, h)).at[id_idx].set(cpl["initial"]["w"][:ni])
        w_in.append(wi.astype(dtype))
        b_in.append(cpl["initial"]["b"][None, :].astype(jnp.float32))

        for k in range(2):
            blk = cpl["blocks"][k]
            big.append(blk["l0"]["w"].astype(dtype))
            b_big.append(blk["l0"]["b"][None, :].astype(jnp.float32))
            big.append(blk["l1"]["w"].astype(dtype))
            b_big.append(blk["l1"]["b"][None, :].astype(jnp.float32))

        # final Linear de-interleaved: column t -> shift at lane tr_idx[t],
        # column nt+t -> unconstrained scale at lane tr_idx[t].
        wf, bf = cpl["final"]["w"], cpl["final"]["b"]
        ws = jnp.zeros((h, dp)).at[:, tr_idx].set(wf[:, :nt])
        wc = jnp.zeros((h, dp)).at[:, tr_idx].set(wf[:, nt:])
        w_shift.append(ws.astype(dtype))
        w_scale.append(wc.astype(dtype))
        b_shift.append(
            jnp.zeros((1, dp)).at[0, tr_idx].set(bf[:nt]).astype(jnp.float32)
        )
        b_scale.append(
            jnp.zeros((1, dp)).at[0, tr_idx].set(bf[nt:]).astype(jnp.float32)
        )
        mask_tr.append(
            jnp.zeros((1, dp)).at[0, tr_idx].set(1.0).astype(jnp.float32)
        )

        w, ld_w = glow._lu_weight(layer["linear"])
        w_inv_t = jnp.linalg.inv(w).T  # z = (x - bias) @ w_inv.T
        lu_inv_t.append(
            jnp.zeros((dp, dp)).at[:d, :d].set(w_inv_t).astype(dtype)
        )
        lu_bias.append(
            jnp.zeros((1, dp)).at[0, :d].set(layer["linear"]["bias"]).astype(
                jnp.float32
            )
        )
        an = layer["actnorm"]
        an_shift.append(
            jnp.zeros((1, dp)).at[0, :d].set(an["shift"]).astype(jnp.float32)
        )
        # exp(-log_scale); padded lanes get 1 so they stay exactly zero.
        an_scale.append(
            jnp.ones((1, dp)).at[0, :d].set(
                jnp.exp(-an["log_scale"])
            ).astype(jnp.float32)
        )
        ld_const = ld_const + ld_w + jnp.sum(an["log_scale"])

    packed = {
        "big": jnp.stack(big),            # (L*4, H, H)
        "b_big": jnp.stack(b_big),        # (L*4, 1, H)
        "w_in": jnp.stack(w_in),          # (L, Dp, H)
        "b_in": jnp.stack(b_in),          # (L, 1, H)
        "w_shift": jnp.stack(w_shift),    # (L, H, Dp)
        "b_shift": jnp.stack(b_shift),    # (L, 1, Dp)
        "w_scale": jnp.stack(w_scale),    # (L, H, Dp)
        "b_scale": jnp.stack(b_scale),    # (L, 1, Dp)
        "lu_inv_t": jnp.stack(lu_inv_t),  # (L, Dp, Dp)
        "lu_bias": jnp.stack(lu_bias),    # (L, 1, Dp)
        "an_shift": jnp.stack(an_shift),  # (L, 1, Dp)
        "an_scale": jnp.stack(an_scale),  # (L, 1, Dp)
        "mask_tr": jnp.stack(mask_tr),    # (L, 1, Dp)
    }
    return packed, dp, ld_const


def pack_glow_context(params: list[dict], cfg: GlowConfig, context: jax.Array):
    """(L*STAGES, B, 1, H) stage-indexed context projections: stage st of
    (reversed) layer l reads row l*5+st — initial proj for st=0, block-0 gate
    for st=1, block-1 gate for st=3 (st=2/4 rows are unused zeros)."""
    cache = glow._ctx_cache(params, context)
    b = context.shape[0]
    h = cfg.hidden
    rows = []
    zero = jnp.zeros((b, h))
    for i in reversed(range(cfg.num_layers)):
        rows.extend([
            cache[i]["initial"],
            cache[i]["blocks"][0],
            zero,
            cache[i]["blocks"][1],
            zero,
        ])
    return jnp.stack(rows)[:, :, None, :]


def _kernel(
    z0_ref, ctx_ref,
    big_ref, b_big_ref, w_in_ref, b_in_ref,
    w_shift_ref, b_shift_ref, w_scale_ref, b_scale_ref,
    lu_inv_ref, lu_bias_ref, an_shift_ref, an_scale_ref, mask_ref,
    x_out_ref, ld_out_ref,
    x_scratch, ld_scratch, temps_scratch, t_scratch,
    *, n_layers: int,
):
    import jax.experimental.pallas as pl

    s = pl.program_id(1)
    st = s % STAGES

    @pl.when(s == 0)
    def _():
        x_scratch[:] = z0_ref[0]
        ld_scratch[:] = jnp.zeros_like(ld_scratch)

    dtype = big_ref.dtype
    ctx = ctx_ref[0]  # (ipt, 1, H) — broadcasts over the hypothesis rows

    def dot(a, w_ref, b=None):
        out = jnp.dot(
            a.astype(dtype), w_ref[0], preferred_element_type=jnp.float32
        )
        return out if b is None else out + b[0]

    @pl.when(st == 0)
    def _():
        temps_scratch[:] = dot(x_scratch[:], w_in_ref, b_in_ref) + ctx
        t_scratch[:] = dot(
            jnp.maximum(temps_scratch[:], 0.0), big_ref, b_big_ref
        )

    @pl.when((st == 1) | (st == 3))
    def _():
        u = dot(jnp.maximum(t_scratch[:], 0.0), big_ref, b_big_ref)
        temps_scratch[:] = temps_scratch[:] + u * jax.nn.sigmoid(ctx)

    @pl.when(st == 2)
    def _():
        t_scratch[:] = dot(
            jnp.maximum(temps_scratch[:], 0.0), big_ref, b_big_ref
        )

    @pl.when(st == 4)
    def _():
        temps = temps_scratch[:]
        shift = dot(temps, w_shift_ref, b_shift_ref)
        sraw = dot(temps, w_scale_ref, b_scale_ref)
        mask = mask_ref[0]  # (1, Dp) broadcasts
        scale = jnp.where(
            mask > 0, jax.nn.sigmoid(sraw + 2.0) + 1e-3, 1.0
        )
        x = x_scratch[:]
        x = (x - shift * mask) / scale
        ld_scratch[:] = ld_scratch[:] + jnp.log(scale)
        x = dot(x - lu_bias_ref[0], lu_inv_ref)
        x_scratch[:] = (x - an_shift_ref[0]) * an_scale_ref[0]

    @pl.when(s == n_layers * STAGES - 1)
    def _():
        x_out_ref[0] = x_scratch[:]
        ld_out_ref[0] = ld_scratch[:]


def auto_images_per_tile(cfg: GlowConfig, rows: int, weight_dtype,
                         requested: int) -> int:
    """Largest tile fitting VMEM: double-buffered stage weights (the (H, H)
    residual matmul dominates) + per-image activation scratch
    (2 x (rows, H) f32 temps + 2 x (rows, Dp) f32 state).

    Known slack: the pipeline's z0 input and x/logdet output blocks ride
    OUTSIDE this estimate (the shipped ProHMR shape fits with them, so
    the formula is not tightened without an on-chip re-measure). A
    config near the boundary that hits a scoped-vmem OOM should lower
    images_per_tile explicitly."""
    dp = _round_up(cfg.features, LANE)
    h = cfg.hidden
    itemsize = jnp.dtype(weight_dtype).itemsize
    stage_w = max(h * h, h * dp * 2 + dp * dp) * itemsize
    budget = VMEM_BYTES - 2 * stage_w - 3 * 1024 * 1024
    per_image = rows * (2 * h + 2 * dp) * 4
    return max(1, min(requested, budget // per_image))


@functools.partial(jax.jit, static_argnames=("n_layers", "h"))
def _fused_transform(packed: dict, z0_tiles, ctx_stages, n_layers: int, h: int):
    """z0_tiles: (C, ipt, R, Dp); ctx_stages: (L*5, C*ipt, 1, H).

    Returns (x (C, ipt, R, Dp), logdet (C, ipt, R)).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c, ipt, r, dp = z0_tiles.shape
    grid = (c, n_layers * STAGES)

    def chunk_only(ic, s):
        return (ic, 0, 0, 0)

    def stage_chunk(ic, s):
        return (s, ic, 0, 0)

    def layer3(ic, s):
        return (s // STAGES, 0, 0)

    def big_idx(ic, s):
        # st=4 reuses st=3's block -> no refetch on the affine stage.
        return ((s // STAGES) * 4 + jnp.minimum(s % STAGES, 3), 0, 0)

    w = lambda shape, idx: pl.BlockSpec((1, *shape), idx,
                                        memory_space=pltpu.VMEM)
    x_out, logdet = pl.pallas_call(
        functools.partial(_kernel, n_layers=n_layers),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ipt, r, dp), chunk_only, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ipt, 1, h), stage_chunk, memory_space=pltpu.VMEM),
            w((h, h), big_idx), w((1, h), big_idx),
            w((dp, h), layer3), w((1, h), layer3),
            w((h, dp), layer3), w((1, dp), layer3),
            w((h, dp), layer3), w((1, dp), layer3),
            w((dp, dp), layer3), w((1, dp), layer3),
            w((1, dp), layer3), w((1, dp), layer3), w((1, dp), layer3),
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
            pltpu.VMEM((ipt, r, h), jnp.float32),
            pltpu.VMEM((ipt, r, h), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(
        z0_tiles,
        ctx_stages,
        packed["big"], packed["b_big"], packed["w_in"], packed["b_in"],
        packed["w_shift"], packed["b_shift"], packed["w_scale"],
        packed["b_scale"], packed["lu_inv_t"], packed["lu_bias"],
        packed["an_shift"], packed["an_scale"], packed["mask_tr"],
    )
    return x_out, jnp.sum(logdet, axis=-1)


def sample_and_log_prob_fused(
    params: list[dict],
    context: jax.Array,
    key: jax.Array,
    n: int,
    temp: float = 1.0,
    cfg: GlowConfig | None = None,
    noise: jax.Array | None = None,
    images_per_tile: int = 8,
    weight_dtype=jnp.bfloat16,
):
    """Drop-in fused replacement for flows.glow.sample_and_log_prob
    (inference path: no dropout, no BN). Same noise in -> same samples out.

    Returns hypothesis-major (x (n*B, D), log_prob (n*B,)).
    """
    cfg = cfg or glow.infer_config(params)
    b = context.shape[0]
    d = cfg.features
    r = _round_up(n, 8)
    ipt = min(auto_images_per_tile(cfg, r, weight_dtype, images_per_tile), b)
    b_pad = _round_up(b, ipt)

    packed, dp, ld_const = pack_glow_weights(params, cfg, dtype=weight_dtype)
    ctx_stages = pack_glow_context(params, cfg, context)
    if b_pad != b:
        ctx_stages = jnp.pad(
            ctx_stages, ((0, 0), (0, b_pad - b), (0, 0), (0, 0))
        )

    if noise is None:
        # Draw EXACTLY like glow.sample_and_log_prob (split + (n*b, d)
        # hypothesis-major): same key -> same hypotheses on both paths,
        # so toggling use_pallas_sampler (or the CPU/TPU auto gate) never
        # changes a seeded run's samples.
        key, k_noise = jax.random.split(key)
        noise = jax.random.normal(k_noise, (n * b, d)) * temp
    # Reference layout is hypothesis-major (n*B, D); regroup image-major.
    z0 = jnp.transpose(noise.reshape(n, b, d), (1, 0, 2))
    z0 = jnp.pad(z0, ((0, b_pad - b), (0, r - n), (0, 0)))
    z0_tiles = jnp.pad(z0, ((0, 0), (0, 0), (0, dp - d))).reshape(
        b_pad // ipt, ipt, r, dp
    )
    x_tiles, logdet = _fused_transform(
        packed, z0_tiles, ctx_stages, cfg.num_layers, cfg.hidden
    )
    x_tiles = x_tiles.reshape(b_pad, r, dp)[:b, :n, :d]
    logdet = logdet.reshape(b_pad, r)[:b, :n]

    x = jnp.transpose(x_tiles, (1, 0, 2)).reshape(n * b, d)
    lp = std_normal_logp(z0[:b, :n, :d]) + logdet + ld_const
    return x, jnp.transpose(lp, (1, 0)).reshape(n * b)


def structural_ok(cfg: GlowConfig) -> bool:
    """The kernel's architectural constraints (backend-independent)."""
    return cfg.num_blocks == 2 and not cfg.use_batch_norm


def supported(cfg: GlowConfig) -> bool:
    return jax.default_backend() == "tpu" and structural_ok(cfg)
