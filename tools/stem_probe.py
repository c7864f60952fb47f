"""Empirical cost envelope for a fused Pallas resnet stem (docs/PERF.md
round-3 stem study).

Measures the proposed kernel's three cost components at real shapes
(B=32, 256px, 64 features) against the XLA stem+maxpool it would replace:

  1. tap construction — 21 rolled/masked (264, 128) parity planes,
  2. im2col materialisation — 2688 (7, 128) consecutive-sublane block
     copies into the (152, 16384) K-major B matrix,
  3. the single big GEMM (64, 152) @ (152, 16384).

The kernel math is shape-faithful but NOT numerically wired to conv
semantics (weights/taps are real data, the tap->weight correspondence is
arbitrary): this is a performance probe, not a correctness candidate. If
the probe's step time beats the XLA stem+pool envelope, the full kernel is
worth building; docs/PERF.md records the verdict.

Usage: python -m tools.stem_probe   (TPU; prints one JSON line per side)
"""

import json
import sys
import time

B, IMG, F = 32, 256, 64
ROWS = IMG + 8          # padded rows
TAPS21 = 21             # (kx, c) groups
KDIM = 152              # 147 taps padded to sublane multiple
NLANES = 128 * 128      # conv rows x cols, flattened on lanes


def probe_kernel_step():
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # (kx, c) -> (colparity, shift): col = 2j + kx - 3.
    specs = []
    for kx in range(7):
        cp = (kx + 1) % 2
        shift = (4 - kx) // 2
        for c in range(3):
            specs.append((cp * 3 + c, shift))

    def kernel(x_ref, a_ref, out_ref, r_scratch, b_scratch, acc_scratch):
        x = x_ref[0]  # (6, ROWS, 128) f32 parity planes (Mosaic cannot
        # rotate non-32-bit data — empirical r3 finding; bf16 taps would
        # halve the roll traffic but fail to compile)
        lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 1)
        # 1. tap construction: roll + edge mask per (kx, c) group.
        for t, (plane, shift) in enumerate(specs):
            # pltpu.roll wants non-negative shifts; negative = 128 + shift.
            v = pltpu.roll(x[plane], shift % 128, axis=1)
            if shift > 0:
                v = jnp.where(lane >= shift, v, 0.0)
            elif shift < 0:
                v = jnp.where(lane <= 127 + shift, v, 0.0)
            r_scratch[t] = v.astype(jnp.bfloat16)

        # 2. im2col: 21 consecutive-sublane (7, 128) copies per conv row.
        # FULLY UNROLLED: Mosaic rejects dynamic sublane starts it cannot
        # prove 8-aligned ("cannot statically prove that index in dimension
        # 1 is a multiple of 8" — empirical r3 finding; the 2i+1 source rows
        # are odd by construction, so a fori_loop form is uncompilable).
        for i in range(128):
            for t in range(TAPS21):
                b_scratch[7 * t:7 * t + 7, 128 * i:128 * (i + 1)] = (
                    r_scratch[t, 2 * i + 1:2 * i + 8, :]
                )

        # 3. the single big GEMM.
        acc_scratch[:] = jnp.dot(
            a_ref[0], b_scratch[:], preferred_element_type=jnp.float32
        )
        # Reduce to a small output with full dependency (anti-DCE).
        total = jnp.zeros((F, 128), jnp.float32)
        for k in range(128):
            total = total + acc_scratch[:, pl.ds(k * 128, 128)]
        out_ref[0] = total

    @jax.jit
    def step(x_planar, a):
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, 6, ROWS, 128), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, F, KDIM), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, F, 128), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, F, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((TAPS21, ROWS, 128), jnp.bfloat16),
                pltpu.VMEM((KDIM, NLANES), jnp.bfloat16),
                pltpu.VMEM((F, NLANES), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(x_planar, a)

    return step


def probe_xla_step():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    @jax.jit
    def step(image, w, g, b):
        y = jax.lax.conv_general_dilated(
            image.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (2, 2),
            [(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = jnp.maximum(y * g + b, 0.0)
        return nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

    return step


def bench(fn, args, steps=30, name=""):
    import jax

    from mhentropy_tpu.utils.profiling import scan_seconds_per_step

    best = scan_seconds_per_step(fn, args, jax.random.key(0), steps=steps)
    print(json.dumps({"metric": f"stem probe {name}", "ms_per_step":
                      round(best * 1e3, 3)}), flush=True)
    return best


def main():
    from mhentropy_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    k = jax.random.key(1)
    x_planar = jax.random.uniform(k, (B, 6, ROWS, 128), jnp.float32)
    a = jax.random.uniform(jax.random.key(2), (1, F, KDIM), jnp.bfloat16)
    image = jax.random.uniform(jax.random.key(3), (B, IMG, IMG, 3), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(4), (7, 7, 3, F)) * 0.05
    g = jnp.ones((F,), jnp.bfloat16)
    b = jnp.zeros((F,), jnp.bfloat16)

    # Wall timings of standalone micro-scans through the relay are
    # untrustworthy (docs/PERF.md methodology) — the JSON lines below are
    # recorded for completeness but the AUTHORITATIVE numbers are the
    # per-op device durations from the xplane trace that follows.
    t_kernel = bench(probe_kernel_step(), (x_planar, a), name="pallas-envelope")
    t_xla = bench(probe_xla_step(), (image, w, g, b), name="xla stem+bn+relu+pool")
    print(json.dumps({"pallas_vs_xla_wall_untrusted": round(t_xla / t_kernel, 3)}),
          flush=True)

    from tools.profile_step import _find_xplanes, parse_xplane, summarize

    for name, fn, args in (
        ("pallas-envelope", probe_kernel_step(), (x_planar, a)),
        ("xla-stem", probe_xla_step(), (image, w, g, b)),
    ):
        logdir = f"/tmp/stem_probe_{name}"
        with jax.profiler.trace(logdir):
            jax.block_until_ready(_traced_scan(fn, args, jax.random.key(5)))
        for plane, line, events in parse_xplane(_find_xplanes(logdir)[-1]):
            if line != "XLA Ops":
                continue
            s = summarize(events, top=6)
            per_step = {
                n[:80]: round(ns / 20e3, 1)
                for n, ns, _ in s["rows"] if not n.startswith("%while")
            }
            print(json.dumps({
                "trace": name,
                "device_busy_us_per_step": round(s["busy_ns"] / 20e3, 1),
                "top_ops_us_per_step": per_step,
            }), flush=True)
    return 0


def _traced_scan(fn, args, key, steps=20):
    from mhentropy_tpu.utils.profiling import traced_scan

    return traced_scan(fn, args, key, steps)


if __name__ == "__main__":
    sys.exit(main())
