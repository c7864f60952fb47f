"""int8 fused Pallas ResNet stem: the W8A8 counterpart of
models/stem_pallas.py, consuming a models/quant.py calibration site.

Why: the bf16 stem kernel is copy-bound — its im2col materialisation
runs at ~54% of the VPU copy ceiling and is ~2/3 of the kernel's 327
us (docs/PERF.md "stem cost attribution"). s8 activations halve every
byte the kernel moves (planes HBM->VMEM, the 21 rolled tap planes, the
(152, hw) im2col buffer), and the K=152 GEMM rides the MXU's int8 mode
(1.30x measured over bf16 in-kernel, tools/mosaic_int8_probe).

MEASURED RESULT: the int8 kernel LOSES to the bf16 stem kernel — 401
vs 337 us/step on-chip (B=32/256px, xplane device durations, same
50-step scan harness). The GEMM does get faster, but the im2col block
copies get ~1.6x SLOWER per element despite half the bytes: s8 VMEM
tiles are (32, 128) with (4, 1) register packing, so the 2688 (7, 128)
sub-tile stores become masked read-modify-writes (the bf16 (16, 128)
tiling tolerated them at ~54% of the copy ceiling). Kept opt-in
(QuantSpec.int8_stem, default False) as the documented negative-result
substrate, like the stage-2/3 kernels; on-chip parity holds (rel
1.4e-3, `tools/stage1_tpu_check.py stem8`).

Quantization scheme (first-layer-aware variant of quant.py's PTQ):
  - Input: symmetric per-INPUT-channel int8, s_a[c] calibrated as
    max|x_c|/127 over the normalised image. Symmetric means the pad
    value 0 dequantises to exactly 0.0 — the conv's zero padding stays
    exact at the crop borders. The quantize runs XLA-side in f32
    (exact VPU math) before the planarise, so the planes travel s8.
  - Weights: s_a[c] folds INTO the weights before per-output-channel
    quantization (the contraction mixes input channels with different
    scales, so a post-hoc rescale cannot be pulled out of the sum):
      w8[ky,kx,c,f] = round(W[ky,kx,c,f] * s_a[c] / s_w[f]),
      s_w[f] = max|W * s_a|_f / 127.
  - Eval BN folds into the f32 epilogue affine (int8 contraction rows
    cannot carry the bf16 kernel's f32 ones-row bias):
      y = acc_s32 * (s_w[f] * g[f]) + (bias - mean * g)[f],
    applied once per conv-row block before the ReLU+maxpool epilogue
    (maxpool only commutes with the affine when g > 0, which BN does
    not guarantee — so the affine precedes the pool).

Same geometry contract as the bf16 kernel (W == 256, C == 3, 64
filters, eval-mode BN); reference stem semantics per
/root/reference/hand/network.py:56-61 (torchvision resnet conv1/bn1/
relu/maxpool).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mhentropy_tpu.models.stem_pallas import F, KDIM, TAPS21, _SPECS

EPS = 1e-5


def _kernel(x_ref, a_ref, sc_ref, s_ref, out_ref,
            r_scratch, b_scratch, acc_scratch, *, conv_rows: int,
            compute_dtype):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = x_ref[0]  # (6, rows, 128) parity planes, int8
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape[1:], 1)
    for t, (plane, shift) in enumerate(_SPECS):
        # Mosaic rolls only exist for 32-bit data: widen the s8 plane to
        # f32 (quantized integers are f32-exact), roll, store back s8.
        v = pltpu.roll(x[plane].astype(jnp.float32), shift % 128, axis=1)
        if shift > 0:
            v = jnp.where(lane >= shift, v, 0.0)
        elif shift < 0:
            v = jnp.where(lane <= 127 + shift, v, 0.0)
        r_scratch[t] = v.astype(jnp.int8)

    # K padding rows must be ZERO (not the bf16 kernel's ones-plane —
    # the epilogue carries the bias instead); uninitialised VMEM would
    # poison the integer GEMM.
    b_scratch[TAPS21 * 7:KDIM, :] = jnp.zeros(
        (KDIM - TAPS21 * 7, conv_rows * 128), jnp.int8)
    for i in range(conv_rows):
        for t in range(TAPS21):
            b_scratch[7 * t:7 * t + 7, 128 * i:128 * (i + 1)] = (
                r_scratch[t, 2 * i + 1:2 * i + 8, :]
            )

    acc = jax.lax.dot_general(
        a_ref[0], b_scratch[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # Dequant + BN affine once per element (sc rows [0:F] scale,
    # [F:2F] bias; lane-0 column slices are the stage1_int8 per-row
    # broadcast pattern — full (F, 1) vectors crash ApplyVectorLayout).
    acc_scratch[:] = (acc.astype(jnp.float32) * sc_ref[0][0:F, 0:1]
                      + sc_ref[0][F:2 * F, 0:1])

    # ReLU + maxpool 3x3/2 pad 1 + NHWC emit — identical to the bf16
    # kernel's epilogue (stem_pallas._kernel).
    neg = jnp.float32(-jnp.inf)
    lane_f = jax.lax.broadcasted_iota(jnp.int32, (F, 128), 1)
    s_mat = s_ref[0]
    for p in range(conv_rows // 2):
        rows = [r for r in (2 * p - 1, 2 * p, 2 * p + 1) if 0 <= r < conv_rows]

        def relu(r):
            return jnp.maximum(acc_scratch[:, 128 * r:128 * r + 128], 0.0)

        m = relu(rows[0])
        for r in rows[1:]:
            m = jnp.maximum(m, relu(r))
        left = jnp.where(lane_f >= 1, pltpu.roll(m, 1, axis=1), neg)
        right = jnp.where(lane_f <= 126, pltpu.roll(m, 127, axis=1), neg)
        mm = jnp.maximum(jnp.maximum(left, m), right).astype(compute_dtype)
        nhwc = jax.lax.dot_general(
            s_mat, mm, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, p] = nhwc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("compute_dtype", "out_dtype"))
def stem_forward_q(
    image: jax.Array,
    site: dict,
    compute_dtype=jnp.bfloat16,
    out_dtype=jnp.bfloat16,
):
    """Quantized conv7x7/2 + BN(eval) + ReLU + maxpool3x3/2.

    Args:
        image: (B, 256, 256, 3) float (normalised, pre-quantization).
        site: prepare_stem_site's dict — w8 (7,7,3,64) int8 with the
            input scales folded in, inv_a (3,) per-channel quantizers,
            scale/bias (64,) f32 dequant+BN epilogue affine.

    Returns:
        (B, 64, 64, 64) NHWC pooled features in out_dtype.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = image.shape
    assert h % 4 == 0 and w == 256 and c == 3, (h, w, c)
    rows = h + 8
    conv_rows = h // 2

    # Per-channel symmetric quantize in f32 (exact), THEN pad: the pad
    # value 0 dequantises to 0.0, matching the float conv's zero pad.
    xq = jnp.clip(
        jnp.round(image.astype(jnp.float32) * site["inv_a"]), -127, 127
    ).astype(jnp.int8)
    xp = jnp.pad(xq, ((0, 0), (4, 4), (0, 0), (0, 0)))
    planes = jnp.transpose(
        xp.reshape(b, rows, 128, 2, 3), (0, 3, 4, 1, 2)
    ).reshape(b, 6, rows, 128)

    # Tap matrix (F, KDIM) int8: A[f, (kx*3+c)*7 + ky] = w8[ky,kx,c,f];
    # K padding rows zero.
    wt = jnp.transpose(site["w8"], (1, 2, 0, 3)).reshape(147, F)
    a = jnp.pad(wt, ((0, KDIM - 147), (0, 0))).T[None]

    sc = jnp.tile(
        jnp.concatenate([site["scale"], site["bias"]])[:, None], (1, 128)
    ).astype(jnp.float32)[None]

    s_mat = jnp.zeros((F, 128)).at[jnp.arange(F), 2 * jnp.arange(F)].set(
        1.0
    ).astype(compute_dtype)[None]

    out = pl.pallas_call(
        functools.partial(_kernel, conv_rows=conv_rows,
                          compute_dtype=compute_dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 6, rows, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, KDIM), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * F, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, conv_rows // 2, F, F), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, conv_rows // 2, F, F), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((TAPS21, rows, 128), jnp.int8),
            pltpu.VMEM((KDIM, conv_rows * 128), jnp.int8),
            pltpu.VMEM((F, conv_rows * 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # Kernel-local scoped-vmem raise (see stem_pallas.py) — the
            # s8 buffers are half/quarter size but the unrolled epilogue
            # stack still exceeds the 16 MB default.
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(planes, a, sc, s_mat)
    return out


def prepare_stem_site(kernel, bn_p: dict, bn_s: dict, act_maxabs) -> dict:
    """Build the stem quantization site.

    Args:
        kernel: (7, 7, 3, 64) f32 conv weights.
        bn_p / bn_s: bn1 params {scale, bias} / stats {mean, var}.
        act_maxabs: (3,) per-channel max|x| of the normalised image
            (quant.calibrate's "stem/conv1" entry).

    Returns:
        {w8, inv_a, scale, bias} per the module docstring.
    """
    w = jnp.asarray(kernel, jnp.float32)
    s_a = jnp.asarray(act_maxabs, jnp.float32) / 127.0
    s_a = jnp.where(s_a > 0, s_a, 1.0)
    wf = w * s_a[None, None, :, None]
    s_w = jnp.max(jnp.abs(wf), axis=(0, 1, 2)) / 127.0
    s_w = jnp.where(s_w > 0, s_w, 1.0)
    w8 = jnp.clip(jnp.round(wf / s_w), -127, 127).astype(jnp.int8)
    g = bn_p["scale"] / jnp.sqrt(bn_s["var"] + EPS)
    return {
        "w8": w8,
        "inv_a": (1.0 / s_a).astype(jnp.float32),
        "scale": (s_w * g).astype(jnp.float32),
        "bias": jnp.asarray(bn_p["bias"] - bn_s["mean"] * g, jnp.float32),
    }


def xla_reference(image, site, out_dtype=jnp.float32):
    """The site's quantized arithmetic through plain XLA ops — the
    parity-defining reference shared by tests/test_stem_int8.py,
    tests/test_quant.py's wiring substitute, and the on-chip check
    (tools/stage1_tpu_check.py stem8). A change to the quantization
    scheme edits this ONE function and every check follows."""
    import flax.linen as nn

    xq = jnp.clip(
        jnp.round(image.astype(jnp.float32) * site["inv_a"]), -127, 127
    ).astype(jnp.int8)
    yi = jax.lax.conv_general_dilated(
        xq, site["w8"], (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = yi.astype(jnp.float32) * site["scale"] + site["bias"]
    y = nn.max_pool(jnp.maximum(y, 0.0), (3, 3), strides=(2, 2),
                    padding=[(1, 1), (1, 1)])
    return y.astype(out_dtype)


def supported(x, num_filters: int = F, train: bool = False) -> bool:
    return (
        not train
        and jax.default_backend() == "tpu"
        and x.ndim == 4
        and x.shape[1] % 4 == 0
        and x.shape[1] >= 8
        and x.shape[2] == 256
        and x.shape[3] == 3
        and num_filters == F
    )
