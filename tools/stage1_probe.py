"""Empirical cost envelope for a fused Pallas resnet50 stage-1 kernel
(the round-3/4 encoder-MFU study, docs/PERF.md).

Stage 1 (3 bottleneck blocks on 64x64x(64->256) activations) is the largest
region of the inference step (~0.82 ms/step of 3.68 at B=32) and its XLA
fusions run at HBM speed-of-light (e.g. the conv3+add fusion moves 144 MB
-> 173 us measured = the 819 GB/s roofline): the only way to beat it is to
keep the whole stage resident in VMEM. But the stage's GEMMs have
structural MXU inefficiencies (K=64 or N=64 contractions cap at 25-50%),
so whether a fused kernel wins depends on empirical Mosaic costs — tap
shift-copies, relayouts, VPU/MXU overlap — not on a paper model. This
probe measures shape-faithful kernels (weights are real-but-arbitrary
data; NOT numerically wired to conv semantics) in the two candidate
layouts against the XLA stage it would replace:

  A. (HW, C) pixel-major: taps are SUBLANE static slices (the exact
     mechanism the shipped stem kernel uses), but every GEMM has N=64 or
     K=64 (50% MXU ceiling).
  B. (C, HW) channel-major: GEMMs contract at full K with N=4096 (conv1/
     conv2 run at 100% MXU ceiling), but taps are misaligned LANE static
     slices — a Mosaic relayout path the stem never exercised (rolls are
     32-bit-only; this probes whether bf16 lane-offset slices compile and
     what they cost).

Both build the 3x3 conv as 4.5 K=128 tap-pair GEMMs (two 64-channel tap
planes concatenated on the contraction dim), with the 9th slot left for
the folded-BN bias row in a real kernel. Eval-mode BN folds into conv
weights, so the probe epilogues are plain ReLU + residual add.

If a variant's device time beats the XLA stage envelope by enough to pay
the integration tax (output relayout to XLA's preferred stage-2 operand
layout), the full kernel is worth building; docs/PERF.md records the
verdict either way.

Usage: python -m tools.stage1_probe   (TPU; one JSON line per side)
"""

import functools
import json
import sys
import time

B, H, W, C0, CMID, COUT = 32, 64, 64, 64, 64, 256
HW = H * W                      # 4096 pixels per image
TAPS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
PAIRS = [(0, 1), (2, 3), (4, 5), (6, 7), (8, None)]


def _probe_variant_a():
    """(HW, C) pixel-major: sublane-shift taps, N<=64 GEMMs."""
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PAD = 128  # sublane margin; must exceed the widest tap offset (65)
    ROWS = HW + 2 * PAD

    def kernel(x_ref, w1a_ref, w1_ref, wp_ref, w3_ref, wd_ref, out_ref,
               xpad, acc64, acc256, pairbuf):
        x0 = x_ref[0]  # (4096, 64) bf16
        # Zero the tap margins once; center rows are rewritten per block.
        xpad[0:PAD, :] = jnp.zeros((PAD, CMID), jnp.bfloat16)
        xpad[PAD + HW:, :] = jnp.zeros((PAD, CMID), jnp.bfloat16)
        sub = jax.lax.broadcasted_iota(jnp.int32, (HW, CMID), 0)
        w_of = sub % W  # out-pixel column index, for dx edge masks

        def conv2(block):
            acc = jnp.zeros((HW, CMID), jnp.float32)
            for p, (ta, tb) in enumerate(PAIRS):
                def tap(t):
                    if t is None:
                        return jnp.zeros((HW, CMID), jnp.bfloat16)
                    dy, dx = TAPS[t]
                    d = W * dy + dx
                    v = xpad[PAD + d:PAD + d + HW, :]
                    if dx == -1:
                        v = jnp.where(w_of > 0, v, 0)
                    elif dx == 1:
                        v = jnp.where(w_of < W - 1, v, 0)
                    return v

                # Two ref-slice stores, not a concat: Mosaic's concatenate
                # rejects operands with mismatched (sublane-offset) layouts
                # ("result/input offset mismatch on non-concat dimension" —
                # the tap slices carry lazy offsets); a store forces
                # materialisation at the ref's canonical layout.
                pairbuf[:, 0:CMID] = tap(ta)
                pairbuf[:, CMID:] = tap(tb)
                acc += jnp.dot(pairbuf[:], wp_ref[block, p],
                               preferred_element_type=jnp.float32)
            return acc

        prev = None
        for block in range(3):
            if block == 0:
                h1 = jnp.maximum(
                    jnp.dot(x0, w1a_ref[0],
                            preferred_element_type=jnp.float32), 0.0
                ).astype(jnp.bfloat16)
            else:
                h1 = jnp.maximum(
                    jnp.dot(prev, w1_ref[block - 1],
                            preferred_element_type=jnp.float32), 0.0
                ).astype(jnp.bfloat16)
            xpad[PAD:PAD + HW, :] = h1
            acc64[:] = conv2(block)
            h2 = jnp.maximum(acc64[:], 0.0).astype(jnp.bfloat16)
            acc256[:] = jnp.dot(h2, w3_ref[block],
                                preferred_element_type=jnp.float32)
            if block == 0:
                res = jnp.dot(x0, wd_ref[0],
                              preferred_element_type=jnp.float32)
            else:
                res = prev.astype(jnp.float32)
            prev = jnp.maximum(acc256[:] + res, 0.0).astype(jnp.bfloat16)
        out_ref[0] = prev

    @jax.jit
    def step(x, w1a, w1, wp, w3, wd):
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, HW, C0), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C0, CMID), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, COUT, CMID), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, 5, 2 * CMID, CMID), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, CMID, COUT), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C0, COUT), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, HW, COUT), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, HW, COUT), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((ROWS, CMID), jnp.bfloat16),
                pltpu.VMEM((HW, CMID), jnp.float32),
                pltpu.VMEM((HW, COUT), jnp.float32),
                pltpu.VMEM((HW, 2 * CMID), jnp.bfloat16),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(x, w1a, w1, wp, w3, wd)

    key = jax.random.key(0)
    args = (
        jax.random.normal(key, (B, HW, C0), jnp.bfloat16) * 0.1,
        jax.random.normal(jax.random.fold_in(key, 1), (1, C0, CMID),
                          jnp.bfloat16) * 0.05,
        jax.random.normal(jax.random.fold_in(key, 2), (2, COUT, CMID),
                          jnp.bfloat16) * 0.05,
        jax.random.normal(jax.random.fold_in(key, 3), (3, 5, 2 * CMID, CMID),
                          jnp.bfloat16) * 0.05,
        jax.random.normal(jax.random.fold_in(key, 4), (3, CMID, COUT),
                          jnp.bfloat16) * 0.05,
        jax.random.normal(jax.random.fold_in(key, 5), (1, C0, COUT),
                          jnp.bfloat16) * 0.05,
    )
    return step, args


def _probe_variant_b():
    """(C, HW) channel-major: full-K GEMMs, misaligned lane-slice taps."""
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PAD = 128  # lane margin (full lane-tile, so center writes stay aligned)
    LANES = HW + 2 * PAD

    def kernel(x_ref, w1a_ref, w1_ref, wp_ref, w3_ref, wd_ref, out_ref,
               xpad, acc64, acc256, pairbuf):
        x0 = x_ref[0]  # (64, 4096) bf16
        xpad[:, 0:PAD] = jnp.zeros((CMID, PAD), jnp.bfloat16)
        xpad[:, PAD + HW:] = jnp.zeros((CMID, PAD), jnp.bfloat16)
        lane = jax.lax.broadcasted_iota(jnp.int32, (CMID, HW), 1)
        w_of = lane % W

        def conv2(block):
            acc = jnp.zeros((CMID, HW), jnp.float32)
            for p, (ta, tb) in enumerate(PAIRS):
                def tap(t):
                    if t is None:
                        return jnp.zeros((CMID, HW), jnp.bfloat16)
                    dy, dx = TAPS[t]
                    d = W * dy + dx
                    v = xpad[:, PAD + d:PAD + d + HW]
                    if dx == -1:
                        v = jnp.where(w_of > 0, v, 0)
                    elif dx == 1:
                        v = jnp.where(w_of < W - 1, v, 0)
                    return v

                # Ref-slice stores instead of concat (see variant A note).
                pairbuf[0:CMID, :] = tap(ta)
                pairbuf[CMID:, :] = tap(tb)
                acc += jnp.dot(wp_ref[block, p], pairbuf[:],
                               preferred_element_type=jnp.float32)
            return acc

        prev = None
        for block in range(3):
            if block == 0:
                h1 = jnp.maximum(
                    jnp.dot(w1a_ref[0], x0,
                            preferred_element_type=jnp.float32), 0.0
                ).astype(jnp.bfloat16)
            else:
                h1 = jnp.maximum(
                    jnp.dot(w1_ref[block - 1], prev,
                            preferred_element_type=jnp.float32), 0.0
                ).astype(jnp.bfloat16)
            xpad[:, PAD:PAD + HW] = h1
            acc64[:] = conv2(block)
            h2 = jnp.maximum(acc64[:], 0.0).astype(jnp.bfloat16)
            acc256[:] = jnp.dot(w3_ref[block], h2,
                                preferred_element_type=jnp.float32)
            if block == 0:
                res = jnp.dot(wd_ref[0], x0,
                              preferred_element_type=jnp.float32)
            else:
                res = prev.astype(jnp.float32)
            prev = jnp.maximum(acc256[:] + res, 0.0).astype(jnp.bfloat16)
        out_ref[0] = prev

    @jax.jit
    def step(x, w1a, w1, wp, w3, wd):
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, C0, HW), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, CMID, C0), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, CMID, COUT), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, 5, CMID, 2 * CMID), lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, COUT, CMID), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, COUT, C0), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, COUT, HW), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, COUT, HW), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((CMID, LANES), jnp.bfloat16),
                pltpu.VMEM((CMID, HW), jnp.float32),
                pltpu.VMEM((COUT, HW), jnp.float32),
                pltpu.VMEM((2 * CMID, HW), jnp.bfloat16),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(x, w1a, w1, wp, w3, wd)

    key = jax.random.key(0)
    args = (
        jax.random.normal(key, (B, C0, HW), jnp.bfloat16) * 0.1,
        jax.random.normal(jax.random.fold_in(key, 1), (1, CMID, C0),
                          jnp.bfloat16) * 0.05,
        jax.random.normal(jax.random.fold_in(key, 2), (2, CMID, COUT),
                          jnp.bfloat16) * 0.05,
        jax.random.normal(jax.random.fold_in(key, 3), (3, 5, CMID, 2 * CMID),
                          jnp.bfloat16) * 0.05,
        jax.random.normal(jax.random.fold_in(key, 4), (3, COUT, CMID),
                          jnp.bfloat16) * 0.05,
        jax.random.normal(jax.random.fold_in(key, 5), (1, COUT, C0),
                          jnp.bfloat16) * 0.05,
    )
    return step, args


def _probe_xla():
    """The replacement target: 3 real eval-mode bottleneck blocks."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from mhentropy_tpu.models import resnet

    class Stage1(nn.Module):
        @nn.compact
        def __call__(self, x):
            conv = functools.partial(nn.Conv, use_bias=False,
                                     dtype=jnp.bfloat16)
            norm = functools.partial(nn.BatchNorm, use_running_average=True,
                                     momentum=0.9, epsilon=1e-5,
                                     dtype=jnp.bfloat16)
            for j in range(3):
                x = resnet.Bottleneck(filters=64, strides=1, conv=conv,
                                      norm=norm, name=f"b{j}")(x)
            return x

    mod = Stage1()
    x = jax.random.normal(jax.random.key(0), (B, H, W, C0), jnp.bfloat16) * 0.1
    variables = mod.init(jax.random.key(1), x)

    @jax.jit
    def step(x):
        return mod.apply(variables, x)

    return step, (x,)


def _traced_scan(fn, args, key, steps=20):
    from mhentropy_tpu.utils.profiling import traced_scan

    return traced_scan(fn, args, key, steps)


def main():
    from mhentropy_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from tools.profile_step import _find_xplanes, parse_xplane, summarize

    only = set(sys.argv[1:])
    for name, make in (("xla-stage1", _probe_xla),
                       ("pallas-a-hwc", _probe_variant_a),
                       ("pallas-b-chw", _probe_variant_b)):
        if only and name not in only:
            continue
        try:
            fn, args = make()
            t0 = time.perf_counter()
            jax.block_until_ready(_traced_scan(fn, args, jax.random.key(5)))
            compile_s = time.perf_counter() - t0
            logdir = f"/tmp/stage1_probe_{name}"
            with jax.profiler.trace(logdir):
                jax.block_until_ready(
                    _traced_scan(fn, args, jax.random.key(6)))
            for plane, line, events in parse_xplane(_find_xplanes(logdir)[-1]):
                if line != "XLA Ops":
                    continue
                s = summarize(events, top=8)
                per_step = {
                    n[:80]: round(ns / 20e3, 1)
                    for n, ns, _ in s["rows"] if not n.startswith("%while")
                }
                print(json.dumps({
                    "trace": name,
                    "device_busy_us_per_step": round(s["busy_ns"] / 20e3, 1),
                    "compile_s": round(compile_s, 1),
                    "top_ops_us_per_step": per_step,
                }), flush=True)
        except Exception as e:  # one variant failing must not kill the probe
            print(json.dumps({"trace": name, "error": str(e)[:2500]}),
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
