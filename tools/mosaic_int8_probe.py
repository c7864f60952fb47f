"""Probe: does Mosaic lower int8 x int8 -> int32 dots inside a Pallas TPU
kernel on this chip, and does it beat the same kernel's bf16 dot?

Motivation: with the XLA stages 2-4 now int8 (models/quant.py), the two
bf16 Pallas kernels (stem 337 us, stage-1 601 us) are the largest
remaining step items. If Mosaic supports s8 MXU dots, both kernels have
an int8 variant worth building.

Methodology: the honest scanned A/B (varied inputs, full carry) over a
GEMM shaped like stage-1's conv2 workload: (HW=4096*B/8 tiled rows,
K=640) x (640, 128). Per docs/PERF.md, kernel-only micro-scans can still
read optimistic through the relay — treat the RATIO as the signal, not
the absolute us.

Usage: python -m tools.mosaic_int8_probe [lower|time]
"""

import json
import sys
import time


def make_kernels():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    # Big enough that the GEMM dominates per-step scan/dispatch overhead
    # (at the original 1024x640x128 both sides read ~128 us/step of pure
    # overhead and the ratio was meaningless in absolute terms).
    M, K, N = 32768, 640, 512
    GRID = 32  # (1024, 640) blocks — the 4096-row int8 block crashed the
    # Mosaic compile helper (HTTP 500 through the relay, reproducible)

    def body_bf16(x_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def body_int8(x_ref, w_ref, o_ref):
        acc = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        o_ref[...] = acc

    def call(body, in_dtype, out_dtype):
        @jax.jit
        def f(x, w):
            # Enforce the probed input dtype here: the parameter was
            # previously dead (the caller's array dtypes silently won),
            # which would mis-measure if someone probes a new dtype.
            x = x.astype(in_dtype)
            w = w.astype(in_dtype)
            return pl.pallas_call(
                body,
                grid=(GRID,),
                in_specs=[
                    pl.BlockSpec((M // GRID, K), lambda i: (i, 0)),
                    pl.BlockSpec((K, N), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((M // GRID, N), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
            )(x, w)

        return f

    return (M, K, N), call(body_bf16, jnp.bfloat16, jnp.bfloat16), \
        call(body_int8, jnp.int8, jnp.int32)


def main(argv):
    mode = argv[0] if argv else "lower"
    from mhentropy_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    (M, K, N), f_bf16, f_int8 = make_kernels()
    kx = jax.random.key(0)
    x8 = jax.random.randint(kx, (M, K), -127, 127, jnp.int8)
    w8 = jax.random.randint(jax.random.key(1), (K, N), -127, 127, jnp.int8)
    xb = x8.astype(jnp.bfloat16)
    wb = w8.astype(jnp.bfloat16)

    out = {"metric": "mosaic int8 dot probe", "lowers": None}
    try:
        r8 = jax.block_until_ready(f_int8(x8, w8))
        rb = jax.block_until_ready(f_bf16(xb, wb))
        ok = bool(jnp.allclose(r8.astype(jnp.float32),
                               jnp.asarray(rb, jnp.float32), rtol=0.05,
                               atol=64))
        out["lowers"] = True
        out["matches_bf16"] = ok
    except Exception as e:  # noqa: BLE001 — the probe's whole point
        out["lowers"] = False
        out["error"] = str(e).split("\n")[0][:200]
        print(json.dumps(out))
        return 0

    if mode == "time":
        def scan_of(f, x, w):
            @jax.jit
            def run(x, w, key):
                def bodyfn(carry, k):
                    # Non-zero per-step perturbation on BOTH sides — a
                    # loop-invariant input lets XLA hoist the kernel out
                    # of the scan (CLAUDE.md measurement rules).
                    if x.dtype == jnp.int8:
                        xk = x ^ jax.random.randint(k, (1, 1), 0, 2, x.dtype)
                    else:
                        xk = x + jax.random.uniform(k, (1, 1),
                                                    x.dtype) * 1e-3
                    o = f(xk, w)
                    return carry + o.astype(jnp.float32).sum() * 1e-20, None

                acc, _ = jax.lax.scan(bodyfn, 0.0,
                                      jax.random.split(key, 200))
                return acc

            jax.block_until_ready(run(x, w, jax.random.key(2)))
            best = 1e9
            for r in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(run(x, w, jax.random.fold_in(
                    jax.random.key(2), r)))
                best = min(best, (time.perf_counter() - t0) / 200)
            return best * 1e6

        us8 = scan_of(f_int8.__wrapped__ if hasattr(f_int8, "__wrapped__")
                      else f_int8, x8, w8)
        usb = scan_of(f_bf16.__wrapped__ if hasattr(f_bf16, "__wrapped__")
                      else f_bf16, xb, wb)
        out["int8_us"] = round(us8, 2)
        out["bf16_us"] = round(usb, 2)
        out["ratio"] = round(usb / us8, 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
