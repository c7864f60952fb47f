"""int8 fused Pallas resnet50 stage-2/3: the W8A8 mid-stages, VMEM
resident, consuming models/quant.py calibration sites.

Why: with q_from<=1 the int8 XLA stages are HBM-bound, not MXU-bound —
the xplane budget at the headline shape shows stage 2 at 511 us and
stage 3 at 372 us/step, dominated by conv+requant fusions that each pay
a full HBM round trip and by (s8, bf16) tuple handoffs between blocks
(docs/PERF.md "int8 step budget"). This kernel runs a whole stage per
grid step with every intermediate resident in VMEM: the only HBM
traffic is the stage input, the stage output, and the weights.

Design (per image, all activations channel-major (C, hw) int8):

  * entry: quantize NHWC on the VPU (exact f32 — quantize BEFORE any
    MXU transpose, the stage1_int8 lesson), then transpose to
    channel-major via chunked s8 eye-dots (integer-exact).
  * conv1/conv3/downsample: plain (Cout, Cin) @ (Cin, hw) s8 GEMMs with
    the quant._qconv epilogue folded in f32 (scale*acc+bias, requant
    factor folded into the producer's scale like stage1_int8).
  * conv2 (3x3): taps as unaligned lane slices of a zero-padded
    channel-major buffer (the validated stage-1 pattern), with the
    K=9*W contraction split into three tap-triple GEMMs so no int8
    operand block exceeds 1024 sublane rows (a larger block crashes
    the Mosaic compile helper — docs/PERF.md probe note).
  * the stride-2 first block computes conv2 at full resolution and
    compacts stride-2 with selection matmuls (S[p, q]=1 at the kept
    pixels — the stem kernel's pool idiom); the downsample input is
    compacted the same way. Full-res-then-select costs ~0.45 GMAC/img
    extra but shares the whole tap/GEMM path with the stride-1 blocks.

Reference parity: the same torchvision-v1.5 stage-2/3 bottlenecks
(/root/reference/hand/network.py:54-61), quantized per quant.py's PTQ
scheme; numerically the quant._qconv XLA walk up to f32 association
(+-1 requant ties) and the bf16 final emit.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

PAD = 128


class StageGeom(NamedTuple):
    width: int      # bottleneck width W (conv1/conv2 output channels)
    cin: int        # stage input channels
    cout: int       # stage output channels (4 * width)
    n_blocks: int
    w_in: int       # input image width (pixels); H == W assumed


GEOMS = {2: StageGeom(128, 256, 512, 4, 64),
         3: StageGeom(256, 512, 1024, 6, 32)}

# 3x3 taps grouped by dy (tap-triples): K never exceeds 3*W rows.
TAP_GROUPS = [[(dy, dx) for dx in (-1, 0, 1)] for dy in (-1, 0, 1)]


@functools.lru_cache(maxsize=None)
def _sel00(w_in: int):
    """Stride-2 selection matrices: out chunk j of the compacted map is
    sum_i in_chunk[4j+i] @ S[i]; S[i][p%128, q] = 1 where q indexes the
    kept pixels (2y', 2x') and p their flat position at width w_in.
    Periodic in j because 128 output px always cover 512 input px.
    Returns numpy (cache-safe under jit tracing — a cached jnp array
    created inside a trace would leak the tracer)."""
    w_out = w_in // 2
    S = np.zeros((4, 128, 128), np.int8)
    for q in range(128):
        r, c = divmod(q, w_out)
        p = (2 * r) * w_in + 2 * c
        S[p // 128, p % 128, q] = 1
    return S


def _kernel(x_ref, w1_ref, w2_ref, w3_ref, wd_ref, sel_ref,
            sc1_ref, sc2_ref, sc3_ref, scd_ref, inv_ref, out_ref,
            xq_cm, hpad, pair0, pair1, pair2, h2q_full, h2q, xq_ee,
            resf, prevf, *, g: StageGeom, cm_in: bool):
    f32 = jnp.float32
    W, CIN, COUT = g.width, g.cin, g.cout
    hw_in = g.w_in * g.w_in
    w_out = g.w_in // 2
    hw_out = hw_in // 4
    pairs = (pair0, pair1, pair2)

    def eye(n, dtype):
        r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        q = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        return (r == q).astype(dtype)

    def quant(v):
        return jnp.clip(jnp.round(v), -127, 127).astype(jnp.int8)

    def sdot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    def epi(acc, sc_ref, o, n, stack):
        """acc * scale[c] + bias[c], channel-major rows; the tile
        stacks [scales; biases] on sublanes (stage-1 pattern)."""
        return acc.astype(f32) * sc_ref[o:o + n, 0:1] \
            + sc_ref[stack + o:stack + o + n, 0:1]

    def sel_compact(src, dst, hw_o):
        """(rows, 4*hw_o) s8 -> (rows, hw_o) s8, stride-2 pixels kept;
        values are moved verbatim (sums of one s8 term), so the i32
        accumulator converts straight back to s8."""
        for j in range(hw_o // 128):
            acc = sdot(src[:, 512 * j:512 * j + 128], sel_ref[0])
            for i in range(1, 4):
                acc += sdot(src[:, 512 * j + 128 * i:512 * j + 128 * (i + 1)],
                            sel_ref[i])
            dst[:, 128 * j:128 * (j + 1)] = acc.astype(jnp.int8)

    # ---- entry: channel-major s8 input ----
    if cm_in:
        xq_cm[...] = x_ref[0]
    else:
        xq = quant(x_ref[0].astype(f32) * inv_ref[0]).astype(f32)
        e = eye(CIN, f32)
        for k in range(hw_in // 1024):
            t = jax.lax.dot_general(
                e, xq[1024 * k:1024 * (k + 1), :],
                (((1,), (1,)), ((), ())), preferred_element_type=f32)
            xq_cm[:, 1024 * k:1024 * (k + 1)] = t.astype(jnp.int8)

    hpad[:, 0:PAD] = jnp.zeros((W, PAD), jnp.int8)
    hpad[:, PAD + hw_in:] = jnp.zeros((W, PAD), jnp.int8)

    def conv2_block(j, w_img, hw):
        """Tap-triple GEMMs over the hpad buffer at image width w_img,
        returning the (W, hw) i32 accumulator."""
        w_of = jax.lax.broadcasted_iota(jnp.int32, (W, hw), 1) % w_img
        acc = None
        for gi, taps in enumerate(TAP_GROUPS):
            pb = pairs[gi]
            for p, (dy, dx) in enumerate(taps):
                d = w_img * dy + dx
                v = hpad[:, PAD + d:PAD + d + hw]
                if dx == -1:
                    v = jnp.where(w_of > 0, v, 0)
                elif dx == 1:
                    v = jnp.where(w_of < w_img - 1, v, 0)
                pb[W * p:W * (p + 1), :hw] = v
            a = sdot(w2_ref[j, gi], pb[:, :hw])
            acc = a if acc is None else acc + a
        return acc

    # ---- block 0 (stride 2) ----
    h1 = epi(sdot(w1_ref[0][:, :CIN], xq_cm[...]), sc1_ref, 0, W, g.n_blocks * W)
    hpad[:, PAD:PAD + hw_in] = quant(jnp.maximum(h1, 0.0))
    acc2 = conv2_block(0, g.w_in, hw_in)
    h2 = epi(acc2, sc2_ref, 0, W, g.n_blocks * W)
    h2q_full[...] = quant(jnp.maximum(h2, 0.0))
    sel_compact(h2q_full, h2q, hw_out)
    y3 = epi(sdot(w3_ref[0], h2q[...]), sc3_ref, 0, COUT, g.n_blocks * COUT)
    sel_compact(xq_cm, xq_ee, hw_out)
    resf[...] = epi(sdot(wd_ref[...], xq_ee[...]), scd_ref, 0, COUT, COUT)
    prevf[...] = jnp.maximum(y3 + resf[...], 0.0)

    # ---- blocks 1..n-1 (stride 1 at w_out) ----
    for j in range(1, g.n_blocks):
        pq = quant(prevf[...] * inv_ref[j])
        h1 = epi(sdot(w1_ref[j], pq), sc1_ref, j * W, W, g.n_blocks * W)
        hpad[:, PAD:PAD + hw_out] = quant(jnp.maximum(h1, 0.0))
        if j == 1:
            # Taps at w_out only read PAD lanes past hw_out; clear the
            # block-0 full-res leftovers there once.
            hpad[:, PAD + hw_out:2 * PAD + hw_out] = jnp.zeros(
                (W, PAD), jnp.int8)
        acc2 = conv2_block(j, w_out, hw_out)
        h2 = epi(acc2, sc2_ref, j * W, W, g.n_blocks * W)
        h2q[...] = quant(jnp.maximum(h2, 0.0))
        y3 = epi(sdot(w3_ref[j], h2q[...]), sc3_ref, j * COUT, COUT,
                 g.n_blocks * COUT)
        prevf[...] = jnp.maximum(y3 + prevf[...], 0.0)

    # ---- emit NHWC bf16 (per-128-px MXU transposes; bf16 operand
    # truncation equals the output dtype, so nothing extra is lost) ----
    pnew = prevf[...].astype(out_ref.dtype)
    e128 = eye(128, out_ref.dtype)
    for ch in range(hw_out // 128):
        t = jax.lax.dot_general(
            e128, pnew[:, 128 * ch:128 * (ch + 1)],
            (((1,), (1,)), ((), ())), preferred_element_type=f32)
        out_ref[0, 128 * ch:128 * (ch + 1), :] = t.astype(out_ref.dtype)


def _site(sites, stage, j, name):
    return sites[f"layer{stage}_{j}/{name}"]


def _tp(w8):  # (1,1,I,O) int8 -> (O, I)
    return jnp.transpose(w8[0, 0], (1, 0))


def _sb(site, fold=None):
    s, b = site["scale"], site["bias"]
    if fold is not None:
        s, b = s * fold, b * fold
    return s.astype(jnp.float32), b.astype(jnp.float32)


def _tile(scales, biases):
    v = jnp.concatenate(list(scales) + list(biases))
    return jnp.tile(v[:, None], (1, 128))


@functools.partial(jax.jit, static_argnames=("stage", "out_dtype",
                                              "cm_in"))
def stage_forward_q(x, sites, stage: int = 2, out_dtype=jnp.bfloat16,
                    cm_in: bool = False):
    """Quantized fused stage forward. x: (B, H, W, Cin) float NHWC, or —
    with cm_in=True — the (B, Cin, H*W) int8 channel-major map emitted
    by stage1_forward_q(emit="cm_s8") (already quantized with this
    stage's conv1 scale; skips the in-kernel quantize + transpose).
    sites: quant.prepare's qtree["sites"] covering layer{stage}_*.
    Returns (B, H/2, W/2, Cout) NHWC in out_dtype."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = GEOMS[stage]
    if cm_in:
        b, cin, hw_in = x.shape
        assert x.dtype == jnp.int8 and cin == g.cin \
            and hw_in == g.w_in * g.w_in, (x.shape, x.dtype, g)
        h = w = g.w_in
        hw_out = hw_in // 4
        xf = x
        in_block = (1, cin, hw_in)
    else:
        b, h, w, cin = x.shape
        hw_in, hw_out = h * w, h * w // 4
        assert (cin, w) == (g.cin, g.w_in) and h == w, (x.shape, g)
        xf = x.reshape(b, hw_in, cin)
        in_block = (1, hw_in, cin)
    W, CIN, COUT, NB = g.width, g.cin, g.cout, g.n_blocks

    st = functools.partial(_site, sites, stage)
    inv2 = [st(j, "conv2")["inv_sa"] for j in range(NB)]
    inv3 = [st(j, "conv3")["inv_sa"] for j in range(NB)]

    # conv1 weights: block 0 consumes CIN channels, later blocks COUT —
    # pad block 0's to COUT columns so one stacked (NB, W, COUT) works.
    w1_list = [jnp.pad(_tp(st(0, "conv1")["w8"]), ((0, 0), (0, COUT - CIN)))]
    w1_list += [_tp(st(j, "conv1")["w8"]) for j in range(1, NB)]
    w1 = jnp.stack(w1_list)

    def pair_w(j):
        k2 = st(j, "conv2")["w8"]  # (3, 3, W, W) s8
        return jnp.stack([
            jnp.concatenate([jnp.transpose(k2[dy + 1, dx + 1], (1, 0))
                             for dy, dx in taps], axis=1)
            for taps in TAP_GROUPS])  # (3, W, 3W)

    w2 = jnp.stack([pair_w(j) for j in range(NB)])
    w3 = jnp.stack([_tp(st(j, "conv3")["w8"]) for j in range(NB)])
    wd = _tp(st(0, "downsample_conv")["w8"])

    sb1 = [_sb(st(j, "conv1"), fold=inv2[j]) for j in range(NB)]
    sc1 = _tile([s for s, _ in sb1], [b_ for _, b_ in sb1])
    sb2 = [_sb(st(j, "conv2"), fold=inv3[j]) for j in range(NB)]
    sc2 = _tile([s for s, _ in sb2], [b_ for _, b_ in sb2])
    sb3 = [_sb(st(j, "conv3")) for j in range(NB)]
    sc3 = _tile([s for s, _ in sb3], [b_ for _, b_ in sb3])
    s_d, b_d = _sb(st(0, "downsample_conv"))
    scd = _tile([s_d], [b_d])
    inv = jnp.stack([jnp.asarray(st(j, "conv1")["inv_sa"], jnp.float32)
                     for j in range(NB)])

    out = pl.pallas_call(
        functools.partial(_kernel, g=g, cm_in=cm_in),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(in_block, lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, W, COUT), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, 3, W, 3 * W), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, COUT, W), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((COUT, CIN), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 128, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * NB * W, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * NB * W, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * NB * COUT, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * COUT, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, hw_out, COUT), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw_out, COUT), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((CIN, hw_in), jnp.int8),            # xq_cm
            pltpu.VMEM((W, hw_in + 2 * PAD), jnp.int8),    # hpad
            pltpu.VMEM((3 * W, hw_in), jnp.int8),          # pair0
            pltpu.VMEM((3 * W, hw_in), jnp.int8),          # pair1
            pltpu.VMEM((3 * W, hw_in), jnp.int8),          # pair2
            pltpu.VMEM((W, hw_in), jnp.int8),              # h2q_full
            pltpu.VMEM((W, hw_out), jnp.int8),             # h2q
            pltpu.VMEM((CIN, hw_out), jnp.int8),           # xq_ee
            pltpu.VMEM((COUT, hw_out), jnp.float32),       # resf
            pltpu.VMEM((COUT, hw_out), jnp.float32),       # prevf
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(xf, w1, w2, w3, wd, jnp.asarray(_sel00(g.w_in)),
      sc1, sc2, sc3, scd, inv)
    return out.reshape(b, h // 2, w // 2, COUT).astype(out_dtype)


def sites_ok(sites, stage: int) -> bool:
    g = GEOMS[stage]
    need = [f"layer{stage}_{j}/conv{k}"
            for j in range(g.n_blocks) for k in (1, 2, 3)]
    need.append(f"layer{stage}_0/downsample_conv")
    return all(k in sites for k in need)


def supported(x, stage: int, train: bool = False) -> bool:
    if stage not in GEOMS:
        return False
    g = GEOMS[stage]
    return (
        not train
        and jax.default_backend() == "tpu"
        and x.ndim == 4
        # A float NHWC map; an int8 input here would be double-scaled
        # by the in-kernel quantize (the cm_in path handles s8).
        and x.dtype != jnp.int8
        and x.shape[3] == g.cin
        and x.shape[1] == x.shape[2] == g.w_in
    )
