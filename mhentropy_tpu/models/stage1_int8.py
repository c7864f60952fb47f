"""int8 fused Pallas resnet50 stage-1: the W8A8 counterpart of
models/stage1_pallas.py, consuming models/quant.py calibration sites.

Why: with stages 2-4 running int8 through XLA (models/quant.py), the
bf16 stage-1 kernel (562 us) is the largest single item of the
quantized step. Mosaic reaches the MXU's int8 mode from kernel dots
(1.30x measured over bf16 in the same kernel — tools/mosaic_int8_probe
after the perturbation fix), and int8 activations halve the VMEM
traffic of the tap-materialisation buffer (5 MB -> 2.25 MB per block).

Same structure as the bf16 kernel (channel-major activations, 3x3 conv
as one K=576 GEMM over materialised tap planes, NHWC emit via MXU
transposes), with the quantized arithmetic of quant._qconv:

  acc_i32 = w8 (M, K) @ xq (K, hw)           # s8 x s8 -> s32 on the MXU
  y       = acc * scale[c] + bias[c]         # f32 epilogue (BN folded)
  next_q  = clip(round(relu(y) * inv_sa'), -127, 127)  # requantize

The requantize factor folds into the epilogue (inv > 0, so
round(inv*relu(y)) == round(relu(acc*(s*inv) + b*inv))); block-boundary
requantizes (the f32 residual accumulator feeding the next conv1) read
their scalars from SMEM. Bias rides the epilogue, not a ones-row — int8
weights cannot carry f32 biases on a contraction row.

Reference parity: the same torchvision-v1.5 stage-1 bottlenecks
(/root/reference/hand/network.py:54-61), quantized per quant.py's PTQ
scheme; site scales are consumed as-is, so this kernel is numerically
the quant._qconv XLA path up to f32 association (+-1 quantization step
on requantize ties).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

F1 = 64
FOUT = 256
PAD = 128
K2 = 576  # 9 taps x 64 channels
TAPS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def _kernel(x_ref, w0_ref, wp_ref, w1_ref, w3_ref, sc0_ref, scp_ref,
            sc1_ref, sc3_ref, inv_ref, out_ref,
            hpad, pairbuf, h3q, resf, prevf, *, hw: int, w: int,
            emit_cm_s8: bool = False, taps: str = "pair"):
    f32 = jnp.float32

    def eye(n, dtype):
        r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        q = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        return (r == q).astype(dtype)

    def quant(v):
        return jnp.clip(jnp.round(v), -127, 127).astype(jnp.int8)

    # Quantize FIRST in NHWC (exact f32 VPU math), THEN transpose to
    # channel-major via the MXU eye-dot. Order matters: kernel dots run
    # at default precision (Precision.HIGH is unsupported in Mosaic), so
    # a pre-quantize transpose truncates activations to bf16 and shifts
    # values across quantization boundaries (measured on-chip: ±1 in
    # xin_q cascading to 42% rel error at the stage output). Quantized
    # integers |v| <= 127 are exact in bf16, so this dot is lossless.
    xq_nhwc = jnp.clip(jnp.round(x_ref[0].astype(f32) * inv_ref[0]),
                       -127, 127)
    xin_q = jax.lax.dot_general(eye(F1, f32), xq_nhwc,
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=f32
                                ).astype(jnp.int8)

    hpad[:, 0:PAD] = jnp.zeros((F1, PAD), jnp.int8)
    hpad[:, PAD + hw:] = jnp.zeros((F1, PAD), jnp.int8)
    w_of = jax.lax.broadcasted_iota(jnp.int32, (F1, hw), 1) % w

    for block in range(3):
        C0 = F1 + FOUT
        if block == 0:
            # conv1 (64 rows) + downsample (256 rows) share the input:
            # one (320, 64) GEMM. Scale/bias tiles stack on SUBLANES
            # ([0:C] scale, [C:2C] bias) — lane-0 slices are the
            # probe-validated per-row broadcast pattern.
            acc0 = jax.lax.dot_general(
                w0_ref[...], xin_q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            h1 = acc0[0:F1, :].astype(f32) * sc0_ref[0:F1, 0:1] \
                + sc0_ref[C0:C0 + F1, 0:1]
            resf[...] = acc0[F1:, :].astype(f32) * sc0_ref[F1:C0, 0:1] \
                + sc0_ref[C0 + F1:, 0:1]
        else:
            pq = quant(prevf[...] * inv_ref[block])
            acc1 = jax.lax.dot_general(
                w1_ref[block - 1], pq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            o = (block - 1) * F1
            h1 = acc1.astype(f32) * sc1_ref[o:o + F1, 0:1] \
                + sc1_ref[2 * F1 + o:2 * F1 + o + F1, 0:1]
        # conv1 epilogue carries scale*inv_sa2, so the quantize is a
        # plain round/clip of the relu.
        hpad[:, PAD:PAD + hw] = quant(jnp.maximum(h1, 0.0))

        if taps == "pair":
            # Materialize the 9 tap planes into one (576, hw) buffer and
            # contract in a single K=576 GEMM.
            for p, (dy, dx) in enumerate(TAPS):
                d = w * dy + dx
                v = hpad[:, PAD + d:PAD + d + hw]
                if dx == -1:
                    v = jnp.where(w_of > 0, v, 0)
                elif dx == 1:
                    v = jnp.where(w_of < w - 1, v, 0)
                pairbuf[F1 * p:F1 * (p + 1), :] = v
            acc2 = jax.lax.dot_general(
                wp_ref[block], pairbuf[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        else:
            # "direct": 9 K=64 dots straight off the hpad slices — same
            # MXU MACs, no tap-plane stores (the pairbuf writes are
            # ~1.2 MB of masked VPU stores per block).
            acc2 = None
            for p, (dy, dx) in enumerate(TAPS):
                d = w * dy + dx
                v = hpad[:, PAD + d:PAD + d + hw]
                if dx == -1:
                    v = jnp.where(w_of > 0, v, 0)
                elif dx == 1:
                    v = jnp.where(w_of < w - 1, v, 0)
                a = jax.lax.dot_general(
                    wp_ref[block][:, F1 * p:F1 * (p + 1)], v,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc2 = a if acc2 is None else acc2 + a
        o2 = block * F1
        h2 = acc2.astype(f32) * scp_ref[o2:o2 + F1, 0:1] \
            + scp_ref[3 * F1 + o2:3 * F1 + o2 + F1, 0:1]
        h3q[...] = quant(jnp.maximum(h2, 0.0))

        acc3 = jax.lax.dot_general(
            w3_ref[block], h3q[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        o3 = block * FOUT
        y3 = acc3.astype(f32) * sc3_ref[o3:o3 + FOUT, 0:1] \
            + sc3_ref[3 * FOUT + o3:3 * FOUT + o3 + FOUT, 0:1]
        if block == 0:
            prevf[...] = jnp.maximum(y3 + resf[...], 0.0)
        else:
            prevf[...] = jnp.maximum(y3 + prevf[...], 0.0)

    if emit_cm_s8:
        # Boundary-fusion emit: quantize with the NEXT stage's conv1
        # activation scale (SMEM slot 3) and hand the channel-major s8
        # map straight to the stage-2 kernel — no NHWC transposes, no
        # bf16 round trip, half the boundary HBM traffic.
        out_ref[0] = quant(prevf[...] * inv_ref[3])
        return

    # Emit NHWC via per-128-pixel-chunk MXU transposes. s8 emit
    # quantizes FIRST (next stage's conv1 scale, SMEM slot 3) so the
    # f32 eye-dot moves bf16-exact integers — XLA stage 2 then consumes
    # the pre-quantized input (quant._qconv_pre), dropping its own
    # quantize pass and half the boundary read.
    if out_ref.dtype == jnp.int8:
        pnew = jnp.clip(jnp.round(prevf[...] * inv_ref[3]), -127, 127)
    else:
        pnew = prevf[...].astype(out_ref.dtype)
    e128 = eye(128, pnew.dtype)
    for ch in range(hw // 128):
        t = jax.lax.dot_general(
            e128, pnew[:, 128 * ch:128 * (ch + 1)],
            (((1,), (1,)), ((), ())), preferred_element_type=f32)
        out_ref[0, 128 * ch:128 * (ch + 1), :] = t.astype(out_ref.dtype)
    if hw % 128:
        off = hw - hw % 128
        t = jax.lax.dot_general(
            eye(64, pnew.dtype), pnew[:, off:],
            (((1,), (1,)), ((), ())), preferred_element_type=f32)
        out_ref[0, off:, :] = t.astype(out_ref.dtype)


def _site(sites, j, name):
    return sites[f"layer1_{j}/{name}"]


def _tp(w8):  # (1,1,I,O) int8 -> (O, I)
    return jnp.transpose(w8[0, 0], (1, 0))


def _sb(site, fold=None):
    """(scale, bias) vectors, optionally folded with a requant inv."""
    s, b = site["scale"], site["bias"]
    if fold is not None:
        s, b = s * fold, b * fold
    return s.astype(jnp.float32), b.astype(jnp.float32)


def _tile(scales, biases):
    """Sublane-stacked [scales; biases] broadcast to 128 lanes — the
    per-row epilogue reads column 0 (lane-aligned slices only)."""
    v = jnp.concatenate(list(scales) + list(biases))
    return jnp.tile(v[:, None], (1, 128))


@functools.partial(jax.jit,
                   static_argnames=("out_dtype", "emit", "taps"))
def stage1_forward_q(x, sites, out_dtype=jnp.bfloat16, emit="nhwc",
                     taps=None):
    """Quantized fused stage-1. x: (B, H, W, 64) float post-stem; sites:
    quant.prepare's qtree["sites"] covering layer1_* (q_from == 0).
    emit="nhwc": returns (B, H, W, 256) in out_dtype.
    emit="nhwc_s8": returns (B, H, W, 256) int8 quantized with
    layer2_0/conv1's activation scale — XLA stage 2 consumes it
    pre-quantized (skips its own quantize + halves the boundary read).
    emit="cm_s8": returns (B, 256, H*W) int8 (same scale) — the fully
    fused handoff for stage2_int8.stage_forward_q(cm_in=True)."""
    import os

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if taps is None:
        taps = os.environ.get("MHENT_STAGE1_TAPS", "pair")
    b, h, w, cin = x.shape
    hw = h * w
    assert cin == F1 and hw % 128 in (0, 64), (b, h, w, cin)
    cm_s8 = emit == "cm_s8"
    if emit in ("cm_s8", "nhwc_s8"):
        assert "layer2_0/conv1" in sites, "s8 emit needs stage-2 sites"
    xf = x.reshape(b, hw, F1)

    inv2 = [_site(sites, j, "conv2")["inv_sa"] for j in range(3)]
    inv3 = [_site(sites, j, "conv3")["inv_sa"] for j in range(3)]
    w0 = jnp.concatenate([_tp(_site(sites, 0, "conv1")["w8"]),
                          _tp(_site(sites, 0, "downsample_conv")["w8"])])
    s_a, b_a = _sb(_site(sites, 0, "conv1"), fold=inv2[0])
    s_d, b_d = _sb(_site(sites, 0, "downsample_conv"))
    sc0 = _tile([s_a, s_d], [b_a, b_d])                   # (640, 128)

    def pair_w(j):
        k2 = _site(sites, j, "conv2")["w8"]               # (3,3,64,64) s8
        return jnp.concatenate(
            [jnp.transpose(k2[dy + 1, dx + 1], (1, 0)) for dy, dx in TAPS],
            axis=1)                                       # (64, 576)

    wp = jnp.stack([pair_w(j) for j in range(3)])
    sbp = [_sb(_site(sites, j, "conv2"), fold=inv3[j]) for j in range(3)]
    scp = _tile([s for s, _ in sbp], [b for _, b in sbp])  # (384, 128)
    w1 = jnp.stack([_tp(_site(sites, j, "conv1")["w8"]) for j in (1, 2)])
    sb1 = [_sb(_site(sites, j, "conv1"), fold=inv2[j]) for j in (1, 2)]
    sc1 = _tile([s for s, _ in sb1], [b for _, b in sb1])  # (256, 128)
    w3 = jnp.stack([_tp(_site(sites, j, "conv3")["w8"]) for j in range(3)])
    sb3 = [_sb(_site(sites, j, "conv3")) for j in range(3)]
    sc3 = _tile([s for s, _ in sb3], [b for _, b in sb3])  # (1536, 128)
    # SMEM scalars: input quantize + block-boundary requantizes (+ the
    # next stage's conv1 scale for the cm_s8 emit).
    invs = [jnp.asarray(_site(sites, j, "conv1")["inv_sa"], jnp.float32)
            for j in range(3)]
    invs.append(jnp.asarray(
        sites["layer2_0/conv1"]["inv_sa"]
        if emit in ("cm_s8", "nhwc_s8") else 1.0, jnp.float32))
    inv = jnp.stack(invs)

    if cm_s8:
        out_spec = pl.BlockSpec((1, FOUT, hw), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, FOUT, hw), jnp.int8)
    else:
        out_spec = pl.BlockSpec((1, hw, FOUT), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct(
            (b, hw, FOUT), jnp.int8 if emit == "nhwc_s8" else out_dtype)

    out = pl.pallas_call(
        functools.partial(_kernel, hw=hw, w=w, emit_cm_s8=cm_s8,
                          taps=taps),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, F1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F1 + FOUT, F1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, F1, K2), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, F1, FOUT), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, FOUT, F1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * (F1 + FOUT), 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6 * F1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * F1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6 * FOUT, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((F1, hw + 2 * PAD), jnp.int8),   # hpad
            # pairbuf is unused in "direct" taps mode (token allocation)
            pltpu.VMEM((K2, hw) if taps == "pair" else (8, 128),
                       jnp.int8),
            pltpu.VMEM((F1, hw), jnp.int8),             # h3q
            pltpu.VMEM((FOUT, hw), jnp.float32),        # resf
            pltpu.VMEM((FOUT, hw), jnp.float32),        # prevf
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(xf, w0, wp, w1, w3, sc0, scp, sc1, sc3, inv)
    if cm_s8:
        return out
    out = out.reshape(b, h, w, FOUT)
    return out if emit == "nhwc_s8" else out.astype(out_dtype)


def sites_ok(sites) -> bool:
    """All stage-1 conv sites present (i.e. calibrated with q_from == 0)."""
    need = [f"layer1_{j}/conv{k}" for j in range(3) for k in (1, 2, 3)]
    need.append("layer1_0/downsample_conv")
    return all(k in sites for k in need)


def supported(x, train: bool = False) -> bool:
    return (
        not train
        and jax.default_backend() == "tpu"
        and x.ndim == 4
        and x.shape[3] == F1
        and x.shape[1] % 8 == 0
        and x.shape[2] % 8 == 0
        and x.shape[2] <= PAD - 2
        and (x.shape[1] * x.shape[2]) % 128 in (0, 64)
        and x.shape[1] * x.shape[2] >= 3136
    )
