"""Fused Pallas ResNet stem: conv7x7/2 + BN + ReLU + maxpool3x3/2 in one
kernel (the round-3 encoder-MFU work, docs/PERF.md).

The 3-channel 7x7/2 stem is the single worst op in the inference step:
XLA lowers it to K=21 GEMM passes at ~10% MXU (510 us/step at B=32/256px,
plus ~200 us for the separate maxpool). This kernel reformulates it as ONE
K=147 GEMM over an im2col matrix built in VMEM:

* XLA side: the image is padded (+4 rows each side) and 'planarised' into 6
  parity planes (column-parity x channel, (B, 6, H/2+8, W/2)); the 7x7x3
  weights become a (64, 152) tap matrix with eval-BN folded in (rows
  scaled by g, bias on a ones-row in the K padding — the stage-1 trick).
* Kernel, per image: 21 lane-rolled/masked tap planes (one per (kx, c)),
  an im2col matrix B (152, 128*128) assembled from consecutive-sublane
  (7, 128) blocks (the 7 ky-taps of a group are 7 consecutive image rows of
  one rolled plane), one (64, 152) @ (152, 16384) GEMM, then the fused
  BN+ReLU+maxpool epilogue with a selection-matmul doing the stride-2
  column compaction and the (f, col) -> (col, f) transpose in one MXU op.

Mosaic constraints discovered while building (tools/stem_probe.py):
rotates only exist for 32-bit data (taps roll in f32, store at compute
dtype), and dynamically-indexed sublane starts must be provably 8-aligned —
the odd 2i+1 source rows therefore force a fully-unrolled copy loop.

Measured cost envelope: 252 us/step vs ~610 us for the XLA stem+pool pair
(B=32, xplane device durations; wall times through the relay are not
trustworthy at this size). Full-pipeline A/B gates the default.

Requires W == 256 (the 128-lane conv-row design), C == 3, 64 filters,
eval-mode BN (running stats); the XLA path remains for everything else.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

F = 64          # stem filters
TAPS21 = 21     # (kx, c) groups
KDIM = 152      # 147 taps padded to a sublane multiple

# (kx, c) -> (plane index = colparity*3 + c, lane shift): col = 2j + kx - 3.
_SPECS = [((kx + 1) % 2 * 3 + c, (4 - kx) // 2)
          for kx in range(7) for c in range(3)]


def _kernel(x_ref, a_ref, s_ref, out_ref,
            r_scratch, b_scratch, acc_scratch, *, conv_rows: int,
            compute_dtype):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = x_ref[0]  # (6, rows, 128) parity planes, compute dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape[1:], 1)
    for t, (plane, shift) in enumerate(_SPECS):
        # Mosaic rolls only exist for 32-bit data: planes travel through HBM
        # at compute dtype (halves the planarise traffic — the XLA stem path
        # quantises the image to bf16 at entry too) and widen per-plane here.
        v = pltpu.roll(x[plane].astype(jnp.float32), shift % 128, axis=1)
        if shift > 0:
            v = jnp.where(lane >= shift, v, 0.0)
        elif shift < 0:
            v = jnp.where(lane <= 127 + shift, v, 0.0)
        r_scratch[t] = v.astype(compute_dtype)

    # Padded K rows: row 147 is a ones-plane carrying the folded BN bias
    # (the stage-1 kernel's trick — the K padding rides in the second MXU
    # pass either way, so the bias is free); the rest zero (uninitialised
    # VMEM may hold NaN bit patterns; 0 * NaN would poison the GEMM).
    pad_rows = jax.lax.broadcasted_iota(
        jnp.int32, (KDIM - TAPS21 * 7, conv_rows * 128), 0
    )
    b_scratch[TAPS21 * 7:KDIM, :] = (pad_rows == 0).astype(compute_dtype)
    for i in range(conv_rows):
        for t in range(TAPS21):
            b_scratch[7 * t:7 * t + 7, 128 * i:128 * (i + 1)] = (
                r_scratch[t, 2 * i + 1:2 * i + 8, :]
            )

    # A carries BN folded in (rows scaled by g, bias on column 147), so
    # acc IS g*conv+b and the epilogue is pure ReLU+maxpool — the old
    # per-pooled-read affine cost ~2 VPU ops x 3 reads x 64 chunks.
    acc_scratch[:] = jnp.dot(
        a_ref[0], b_scratch[:], preferred_element_type=jnp.float32
    )

    # ReLU + maxpool 3x3/2 pad 1 + NHWC emit.
    # Row pooling indexes conv-row lane BLOCKS (static slices); column
    # pooling is two rolls + the selection matmul S[k, 2k]=1, which compacts
    # stride-2 AND transposes (f, col) -> (col, f) in one MXU contraction
    # over the lane dim.
    neg = jnp.float32(-jnp.inf)
    lane_f = jax.lax.broadcasted_iota(jnp.int32, (F, 128), 1)
    s_mat = s_ref[0]  # (64, 128) selection matrix, compute dtype
    for p in range(conv_rows // 2):
        rows = [r for r in (2 * p - 1, 2 * p, 2 * p + 1) if 0 <= r < conv_rows]

        def bnrelu(r):
            blk = acc_scratch[:, 128 * r:128 * r + 128]
            return jnp.maximum(blk, 0.0)

        m = bnrelu(rows[0])
        for r in rows[1:]:
            m = jnp.maximum(m, bnrelu(r))
        left = jnp.where(lane_f >= 1, pltpu.roll(m, 1, axis=1), neg)
        right = jnp.where(lane_f <= 126, pltpu.roll(m, 127, axis=1), neg)
        mm = jnp.maximum(jnp.maximum(left, m), right).astype(compute_dtype)
        nhwc = jax.lax.dot_general(
            s_mat, mm, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, p] = nhwc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("compute_dtype", "out_dtype")
)
def stem_forward(
    image: jax.Array,
    kernel: jax.Array,
    bn_scale: jax.Array,
    bn_bias: jax.Array,
    bn_mean: jax.Array,
    bn_var: jax.Array,
    eps: float = 1e-5,
    compute_dtype=jnp.bfloat16,
    out_dtype=jnp.bfloat16,
):
    """conv7x7/2(pad 3, no bias) + BN(eval) + ReLU + maxpool3x3/2(pad 1).

    Args:
        image: (B, 256, 256, 3) float.
        kernel: (7, 7, 3, 64) conv weights (torch/flax layout).
        bn_*: (64,) BatchNorm params and running stats.

    Returns:
        (B, 64, 64, 64) NHWC pooled features in out_dtype.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = image.shape
    # W is locked to 256 by the lane design (128 lanes x 2 column parities);
    # H only sets the row-loop trip counts — any multiple of 4 works (the
    # CPU interpret-mode test runs h=64 to keep emulation affordable; the
    # production path is 256).
    assert h % 4 == 0 and w == 256 and c == 3, (h, w, c)
    rows = h + 8
    conv_rows = h // 2

    xp = jnp.pad(image.astype(compute_dtype), ((0, 0), (4, 4), (0, 0), (0, 0)))
    # Planarise: (B, rows, 256, 3) -> (B, colparity*3+c, rows, 128).
    planes = jnp.transpose(
        xp.reshape(b, rows, 128, 2, 3), (0, 3, 4, 1, 2)
    ).reshape(b, 6, rows, 128)

    # Tap matrix with BN folded in: A[f, (kx*3+c)*7 + ky] =
    # g[f] * kernel[ky, kx, c, f], and the bias rides column 147 against
    # the ones-plane the kernel writes into the K padding.
    g = bn_scale * jax.lax.rsqrt(bn_var + eps)
    bb = bn_bias - bn_mean * g
    wt = jnp.transpose(kernel, (1, 2, 0, 3)).reshape(147, F) * g[None]
    a = jnp.pad(jnp.concatenate([wt, bb[None]], axis=0),
                ((0, KDIM - 148), (0, 0))).T.astype(compute_dtype)[None]

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
            pl.BlockSpec((1, F, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, conv_rows // 2, F, F), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, conv_rows // 2, F, F), out_dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((TAPS21, rows, 128), compute_dtype),
            pltpu.VMEM((KDIM, conv_rows * 128), compute_dtype),
            pltpu.VMEM((F, conv_rows * 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # Scratch + unrolled-epilogue stack is ~23 MB, over the 16 MB
            # default scoped-vmem limit. Raising it HERE is kernel-local
            # (v5e VMEM is 128 MB); the global xla_tpu_scoped_vmem_limit_kib
            # flag route measurably hurt the rest of the program (round 2).
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(planes, a, s_mat)
    return out


def flops(batch: int, image_size: int = 256) -> int:
    """Conv-semantics FLOPs of the fused stem (7x7/2, 3->64 ch) for MFU
    accounting — XLA's cost analysis cannot see inside the custom call."""
    out_hw = (image_size // 2) ** 2
    return batch * 2 * out_hw * F * 7 * 7 * 3


def supported(x: jax.Array, num_filters: int, train: bool) -> bool:
    return (
        not train
        and jax.default_backend() == "tpu"
        and x.ndim == 4
        and x.shape[1] == 256
        and x.shape[2] == 256
        and x.shape[3] == 3
        and num_filters == F
    )
