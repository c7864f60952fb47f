"""Component attribution for the fused Pallas stem kernel (docs/PERF.md).

The shipped kernel (models/stem_pallas.py) runs ~337 us/step in the
pipeline against a ~50 us conv-FLOP floor; this probe times truncated
variants of the same kernel body to locate the cost:

  rolls    — tap construction only (21 rolled/masked parity planes)
  im2col   — rolls + the 2688 (7, 128) block copies into B
  gemm     — + the (64, 152) @ (152, 16384) GEMM
  full     — + the BN/ReLU/maxpool/NHWC-emit epilogue (= shipped kernel)

Each variant keeps a data dependency on its last phase (ref stores are
not DCE'd by Mosaic, and the scan reduces the output — the relay-safe
methodology of tools/stem_probe.py). Differences between successive
variants attribute the cost. One JSON line per variant.

Usage: python -m tools.stem_cost_attrib    (TPU)
"""

import json
import sys
import time

B, IMG, F = 32, 256, 64
ROWS = IMG + 8
TAPS21 = 21
KDIM = 152
CONV_ROWS = 128
NLANES = CONV_ROWS * 128


def make_step(phase: str):
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mhentropy_tpu.models.stem_pallas import _SPECS

    def kernel(x_ref, a_ref, g_ref, b_ref, s_ref, out_ref,
               r_scratch, b_scratch, acc_scratch):
        c = jnp.bfloat16
        x = x_ref[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape[1:], 1)
        for t, (plane, shift) in enumerate(_SPECS):
            v = pltpu.roll(x[plane].astype(jnp.float32), shift % 128, axis=1)
            if shift > 0:
                v = jnp.where(lane >= shift, v, 0.0)
            elif shift < 0:
                v = jnp.where(lane <= 127 + shift, v, 0.0)
            r_scratch[t] = v.astype(c)
        if phase == "rolls":
            out_ref[0] = sum(
                r_scratch[t, :64, :].astype(jnp.float32) for t in range(TAPS21)
            )
            return

        b_scratch[TAPS21 * 7:KDIM, :] = jnp.zeros(
            (KDIM - TAPS21 * 7, NLANES), c)
        for i in range(CONV_ROWS):
            for t in range(TAPS21):
                b_scratch[7 * t:7 * t + 7, 128 * i:128 * (i + 1)] = (
                    r_scratch[t, 2 * i + 1:2 * i + 8, :]
                )
        if phase == "im2col":
            total = jnp.zeros((F, 128), jnp.float32)
            for k in (0, 64, KDIM - 64):  # overlapping: covers all K rows
                total = total + b_scratch[k:k + 64, :128].astype(jnp.float32)
            out_ref[0] = total
            return

        acc_scratch[:] = jnp.dot(
            a_ref[0], b_scratch[:], preferred_element_type=jnp.float32)
        if phase == "gemm":
            total = jnp.zeros((F, 128), jnp.float32)
            for k in range(CONV_ROWS):
                total = total + acc_scratch[:, pl.ds(k * 128, 128)]
            out_ref[0] = total
            return

        # full epilogue (mirrors stem_pallas._kernel)
        neg = jnp.float32(-jnp.inf)
        g_tile = g_ref[0]
        b_tile = b_ref[0]
        lane_f = jax.lax.broadcasted_iota(jnp.int32, (F, 128), 1)
        s_mat = s_ref[0]
        total = jnp.zeros((F, F), jnp.float32)
        for p in range(CONV_ROWS // 2):
            rows = [r for r in (2 * p - 1, 2 * p, 2 * p + 1)
                    if 0 <= r < CONV_ROWS]

            def bnrelu(r):
                blk = acc_scratch[:, 128 * r:128 * r + 128]
                return jnp.maximum(blk * g_tile + b_tile, 0.0)

            m = bnrelu(rows[0])
            for r in rows[1:]:
                m = jnp.maximum(m, bnrelu(r))
            left = jnp.where(lane_f >= 1, pltpu.roll(m, 1, axis=1), neg)
            right = jnp.where(lane_f <= 126, pltpu.roll(m, 127, axis=1), neg)
            mm = jnp.maximum(jnp.maximum(left, m), right).astype(c)
            nhwc = jax.lax.dot_general(
                s_mat, mm, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            total = total + nhwc
        out_ref[0] = jnp.pad(total, ((0, 0), (0, 128 - F)))

    @jax.jit
    def step(planes, a, g, bb, s):
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, 6, ROWS, 128), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, F, KDIM), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, F, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, F, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, F, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, F, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, F, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((TAPS21, ROWS, 128), jnp.bfloat16),
                pltpu.VMEM((KDIM, NLANES), jnp.bfloat16),
                pltpu.VMEM((F, NLANES), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=48 * 1024 * 1024,
            ),
        )(planes, a, g, bb, s)

    return step


def main():
    from mhentropy_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    key = jax.random.key(0)
    planes = jax.random.normal(key, (B, 6, ROWS, 128), jnp.bfloat16)
    a = jax.random.normal(jax.random.fold_in(key, 1), (1, F, KDIM),
                          jnp.bfloat16)
    g = jnp.ones((1, F, 128), jnp.float32)
    bb = jnp.zeros((1, F, 128), jnp.float32)
    s = jnp.zeros((F, 128)).at[jnp.arange(F), 2 * jnp.arange(F)].set(
        1.0).astype(jnp.bfloat16)[None]

    # Wall times of tiny standalone scans are floor-dominated through the
    # relay (~0.9 ms/step of fixed overhead measured against the shipped
    # kernel's 337 us in-pipeline self-time) — attribute from the xplane
    # device timeline instead, like every trusted number in docs/PERF.md.
    from tools.profile_step import parse_xplane, _find_xplanes

    for phase in ("rolls", "im2col", "gemm", "full"):
        fn = make_step(phase)

        @jax.jit
        def scan(planes, key, fn=fn):
            def body(carry, k):
                varied = planes + jax.random.uniform(
                    k, (1,), planes.dtype) * planes.dtype.type(1e-3)
                out = fn(varied, a, g, bb, s)
                return carry + jnp.sum(out.astype(jnp.float32)) * 1e-20, None

            acc, _ = jax.lax.scan(body, 0.0, jax.random.split(key, 30))
            return acc

        jax.block_until_ready(scan(planes, key))
        logdir = f"/tmp/stem_attrib_{phase}"
        with jax.profiler.trace(logdir):
            jax.block_until_ready(scan(planes, jax.random.fold_in(key, 9)))
        kern_us = 0.0
        for plane_name, line_name, events in parse_xplane(
                _find_xplanes(logdir)[-1]):
            if "XLA Ops" not in line_name or "Async" in line_name:
                continue
            for name, start, dur in events:
                if "custom-call" in name or "kernel" in name:
                    kern_us += dur / 1e3
        print(json.dumps({"phase": phase,
                          "kernel_us_per_step": round(kern_us / 30, 1)}),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
