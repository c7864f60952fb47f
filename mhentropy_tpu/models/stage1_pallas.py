"""Fused Pallas resnet50 stage-1: three bottleneck blocks (conv1x1 + BN +
ReLU -> conv3x3 + BN + ReLU -> conv1x1 + BN + residual + ReLU) in ONE
kernel, VMEM-resident end to end.

Why: stage 1 is the largest region of the inference step (~0.82 ms of
3.68 at B=32/256px) and its XLA fusions run at HBM speed-of-light — each
bottleneck round-trips 64x64 activations through HBM (the conv3+add fusion
alone moves 144 MB -> 173 us measured). Keeping the whole stage in VMEM
cuts the stage's HBM traffic ~8x (read 16 MB stem output + write 64 MB
stage output instead of ~670 MB of intermediates).

Design (probed in tools/stage1_probe.py, docs/PERF.md):

* Channel-major (C, H*W) activations per image: every GEMM contracts at
  full K with N=4096 pixels on lanes (the pixel-major alternative caps at
  50% MXU on its N=64 GEMMs and measured 2x slower — probe variant A).
* 3x3 conv as ONE K=640 GEMM: all 9 64-channel tap planes + the bias
  ones-plane stacked on the contraction dim (5 MXU passes of 128 — the
  same array time as the original five K=128 pair GEMMs, minus their four
  (64, hw) f32 accumulate sweeps; +1% full-pipeline, r3). Tap planes are
  misaligned static LANE slices of a 128-lane-padded buffer; Mosaic
  materialises them on store into the pair buffer (a concatenate of
  offset-layout vectors is rejected — "result/input offset mismatch on
  non-concat dimension" — so each half is stored separately).
* Every BN bias rides a spare contraction row (a ones-plane in the K
  padding), so eval-mode BN folds entirely into the GEMM weights: K=64
  contractions pad to 128 anyway (same MXU pass count), the ones-row is
  free.
* NHWC in/out: the input transposes to channel-major with one MXU
  selection-matmul (dot_general contracting lanes with an identity — the
  stem kernel's trick); the final block emits NHWC via per-128-lane-chunk
  MXU transposes, so XLA sees the layout it already prefers downstream.

Cost envelope (B=32, xplane device durations): probe kernel 538 us vs the
XLA stage's 758 us; the full-pipeline A/B gates the default (docs/PERF.md).

Reference parity: torchvision-semantics bottleneck v1.5 blocks, i.e. the
first stage of the resnet50 the reference builds at
/root/reference/hand/network.py:54-61. Weight layout follows
models/resnet.py so converted checkpoints drive this kernel unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

F1 = 64        # bottleneck mid width (stage-1 filters)
FOUT = 256     # block output channels (expansion 4)
PAD = 128      # lane margin for tap slices (full lane-tile keeps the
               # centre writes aligned; taps reach at most +-(W+1) lanes,
               # so any post-stem width up to 127 fits — 64 and 56 shipped)
K1 = 128       # block-0 conv1/downsample contraction: 64 ch + ones row
KP = 272       # block-1/2 conv1 contraction: 256 ch + ones row, 16-padded

TAPS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
# Tap pairs stacked on K; the odd 9th tap shares its GEMM with the ones
# plane that carries the conv2 BN bias.
PAIRS = [(0, 1), (2, 3), (4, 5), (6, 7), (8, None)]


def _kernel(x_ref, w1a_ref, wd_ref, w1_ref, wp_ref, w3_ref, out_ref,
            xin, hpad, h2s, prev, pairbuf, acc256, *, hw: int, w: int,
            compute_dtype):
    c = compute_dtype
    f32 = jnp.float32

    def eye(n):
        r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        q = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        return (r == q).astype(c)

    # NHWC (hw, 64) -> channel-major (64, hw): one MXU selection-matmul
    # (contract lanes with an identity = transpose; the stem's s_mat trick).
    xt = jax.lax.dot_general(eye(F1), x_ref[0], (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)
    xin[0:F1, :] = xt.astype(c)
    ones_row = (jax.lax.broadcasted_iota(jnp.int32, (F1, hw), 0) == 0)
    xin[F1:K1, :] = ones_row.astype(c)          # bias row for conv1a/ds
    h2s[F1:K1, :] = ones_row.astype(c)          # bias row for conv3
    prev[FOUT:KP, :] = (
        jax.lax.broadcasted_iota(jnp.int32, (KP - FOUT, hw), 0) == 0
    ).astype(c)                                  # bias row for conv1 b1/b2
    hpad[:, 0:PAD] = jnp.zeros((F1, PAD), c)     # dy tap margins (zeros)
    hpad[:, PAD + hw:] = jnp.zeros((F1, PAD), c)

    w_of = jax.lax.broadcasted_iota(jnp.int32, (F1, hw), 1) % w
    ones_plane = jnp.ones((F1, hw), c)

    for block in range(3):
        if block == 0:
            h1 = jnp.dot(w1a_ref[0], xin[:], preferred_element_type=f32)
        else:
            h1 = jnp.dot(w1_ref[block - 1], prev[:],
                         preferred_element_type=f32)
        hpad[:, PAD:PAD + hw] = jnp.maximum(h1, 0.0).astype(c)

        # All 9 taps + the bias ones-plane stacked on K=640 (5 passes of
        # 128, same MXU time as the old 5 pair GEMMs) — ONE dot instead of
        # five, dropping 4 (64, hw) f32 accumulate sweeps per block.
        for p, (ta, tb) in enumerate(PAIRS):
            def tap(t):
                if t is None:
                    return ones_plane  # carries the conv2 bias weights
                dy, dx = TAPS[t]
                d = w * dy + dx
                v = hpad[:, PAD + d:PAD + d + hw]
                # dx wrap masks: flattened rows make (h, W-1)+1 read (h+1, 0).
                if dx == -1:
                    v = jnp.where(w_of > 0, v, 0)
                elif dx == 1:
                    v = jnp.where(w_of < w - 1, v, 0)
                return v

            # Two ref stores, not a concat: Mosaic rejects concatenating
            # vectors whose layouts carry the slice offsets.
            pairbuf[2 * F1 * p:2 * F1 * p + F1, :] = tap(ta)
            pairbuf[2 * F1 * p + F1:2 * F1 * (p + 1), :] = tap(tb)
        acc = jnp.dot(wp_ref[block], pairbuf[:], preferred_element_type=f32)
        h2s[0:F1, :] = jnp.maximum(acc, 0.0).astype(c)

        acc256[:] = jnp.dot(w3_ref[block], h2s[:], preferred_element_type=f32)
        if block == 0:
            res = jnp.dot(wd_ref[0], xin[:], preferred_element_type=f32)
        else:
            res = prev[0:FOUT, :].astype(f32)
        pnew = jnp.maximum(acc256[:] + res, 0.0).astype(c)
        if block < 2:
            prev[0:FOUT, :] = pnew
        else:
            # Emit NHWC: per-128-pixel-chunk MXU transpose (256, 128) ->
            # (128, 256), so stage 2 reads its preferred layout directly.
            # hw % 128 == 64 (e.g. 56x56) gets one half-width tail chunk.
            e128 = eye(128)
            e64 = eye(64)
            for ch in range(hw // 128):
                t = jax.lax.dot_general(
                    e128, pnew[:, 128 * ch:128 * (ch + 1)],
                    (((1,), (1,)), ((), ())), preferred_element_type=f32)
                out_ref[0, 128 * ch:128 * (ch + 1), :] = t.astype(
                    out_ref.dtype)
            if hw % 128:
                off = hw - hw % 128
                t = jax.lax.dot_general(
                    e64, pnew[:, off:],
                    (((1,), (1,)), ((), ())), preferred_element_type=f32)
                out_ref[0, off:, :] = t.astype(out_ref.dtype)


def _fold(kernel11, bn, eps, dtype):
    """(1,1,Cin,F) conv + eval BN -> (F, Cin) GEMM weights + (F,) bias."""
    g = bn["scale"] * jax.lax.rsqrt(bn["var"] + eps)
    a = (kernel11[0, 0] * g[None, :]).T
    return a.astype(dtype), (bn["bias"] - bn["mean"] * g).astype(dtype)


@functools.partial(jax.jit, static_argnames=("compute_dtype", "out_dtype"))
def stage1_forward(x, blocks, eps: float = 1e-5,
                   compute_dtype=jnp.bfloat16, out_dtype=jnp.bfloat16):
    """Three fused stage-1 bottlenecks (eval-mode BN).

    Args:
        x: (B, H, 64, 64) NHWC post-stem activations; H % 8 == 0.
        blocks: list of 3 dicts with keys conv1/conv2/conv3 ((1,1,Cin,F) /
            (3,3,64,64) / (1,1,64,256) kernels), bn1/bn2/bn3 (dicts of
            scale/bias/mean/var), and ds_conv/ds_bn on block 0.

    Returns:
        (B, H, 64, 256) NHWC in out_dtype.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, cin = x.shape
    # w <= PAD-2: the dy/dx=-1..1 tap slices index hpad[PAD+d : PAD+d+hw]
    # with |d| up to w+1 — beyond that the slice start goes negative and
    # reads from the wrong end of the buffer (supported() gates callers,
    # but direct calls must fail loudly too).
    assert cin == F1 and h % 8 == 0 and w % 8 == 0 and w <= PAD - 2 \
        and hw_ok(h, w), (b, h, w, cin)
    hw = h * w
    xf = x.reshape(b, hw, F1).astype(compute_dtype)
    dt = compute_dtype

    def with_bias(a, bias, k):
        out = jnp.zeros(a.shape[:-1] + (k,), dt)
        out = out.at[..., :a.shape[-1]].set(a)
        return out.at[..., a.shape[-1]].set(bias)

    a, bias = _fold(blocks[0]["conv1"], blocks[0]["bn1"], eps, dt)
    w1a = with_bias(a, bias, K1)[None]                       # (1, 64, 128)
    a, bias = _fold(blocks[0]["ds_conv"], blocks[0]["ds_bn"], eps, dt)
    wd = with_bias(a, bias, K1)[None]                        # (1, 256, 128)
    w1 = jnp.stack([
        with_bias(*_fold(blocks[j]["conv1"], blocks[j]["bn1"], eps, dt), KP)
        for j in (1, 2)
    ])                                                       # (2, 64, 272)
    w3 = jnp.stack([
        with_bias(*_fold(blocks[j]["conv3"], blocks[j]["bn3"], eps, dt), K1)
        for j in range(3)
    ])                                                       # (3, 256, 128)

    def pair_weights(j):
        k2, bn2 = blocks[j]["conv2"], blocks[j]["bn2"]
        g = bn2["scale"] * jax.lax.rsqrt(bn2["var"] + eps)
        taps = [(k2[dy + 1, dx + 1] * g[None, :]).T.astype(dt)
                for dy, dx in TAPS]                          # 9 x (64, 64)
        b2 = (bn2["bias"] - bn2["mean"] * g).astype(dt)
        rows = []
        for ta, tb in PAIRS:
            if tb is None:
                # The ones-plane half: the GEMM contracts the 64 ones rows,
                # summing this half's columns — put the conv2 bias in
                # column 0 and zeros elsewhere.
                half = jnp.zeros((F1, F1), dt).at[:, 0].set(b2)
                rows.append(jnp.concatenate([taps[ta], half], axis=1))
            else:
                rows.append(jnp.concatenate([taps[ta], taps[tb]], axis=1))
        return jnp.concatenate(rows, axis=1)                 # (64, 640)

    wp = jnp.stack([pair_weights(j) for j in range(3)])      # (3,64,640)

    out = pl.pallas_call(
        functools.partial(_kernel, hw=hw, w=w, compute_dtype=compute_dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, F1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F1, K1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, FOUT, K1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, F1, KP), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, F1, 10 * F1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, FOUT, K1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, FOUT), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw, FOUT), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((K1, hw), compute_dtype),            # xin
            pltpu.VMEM((F1, hw + 2 * PAD), compute_dtype),  # hpad
            pltpu.VMEM((K1, hw), compute_dtype),            # h2s
            pltpu.VMEM((KP, hw), compute_dtype),            # prev
            pltpu.VMEM((10 * F1, hw), compute_dtype),       # pairbuf (K=640)
            pltpu.VMEM((FOUT, hw), jnp.float32),            # acc256
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # ~14 MB of scratch + I/O double-buffering; kernel-local raise
            # (the global scoped-vmem flag measurably hurt in round 2).
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(xf, w1a, wd, w1, wp, w3)
    return out.reshape(b, h, w, FOUT).astype(out_dtype)


def flops(batch: int, h: int = 64, w: int = 64) -> int:
    """Conv-semantics FLOPs of the fused stage (for MFU accounting — XLA's
    cost analysis cannot see inside the custom call). Matches the measured
    XLA-count delta when the kernel replaces the stage (56.4G at B=32,
    analytic 55.8G; the remainder is BN/ReLU elementwise)."""
    hw = h * w
    block0 = 2 * hw * (F1 * F1 + 9 * F1 * F1 + F1 * FOUT + F1 * FOUT)
    block_n = 2 * hw * (FOUT * F1 + 9 * F1 * F1 + F1 * FOUT)
    return batch * (block0 + 2 * block_n)


def hw_ok(h: int, w: int) -> bool:
    # The NHWC emit handles full 128-pixel chunks plus one 64-wide tail.
    return (h * w) % 128 in (0, 64)


def supported(x: jax.Array, num_filters: int, stage_size: int,
              train: bool) -> bool:
    return (
        not train
        and jax.default_backend() == "tpu"
        and x.ndim == 4
        and x.shape[1] % 8 == 0
        and x.shape[2] % 8 == 0
        and x.shape[2] <= PAD - 2      # tap slices reach +-(W+1) lanes
        and hw_ok(x.shape[1], x.shape[2])
        # Empirical win gate (full-pipeline A/B, both sides measured):
        # +6.3% at 64x64 (hw=4096). 56x56 (hw=3136) was a wash with the
        # five pair GEMMs (836k vs 839k on the ProHMR pipeline) and turned
        # into a win with the single K=640 conv2 (863k vs 849k) — gate
        # includes it. Below 3136 there is no measurement; the smaller the
        # stage, the closer XLA's fusions sit to the roofline.
        and x.shape[1] * x.shape[2] >= 3136
        and x.shape[3] == F1
        and num_filters == F1
        and stage_size == 3
    )
