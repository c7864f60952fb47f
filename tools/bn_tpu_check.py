"""On-chip parity + microbench for the fused train-mode BN reductions.

Interpret-mode tests (tests/test_bn_pallas.py) prove the math; this tool
proves the MOSAIC compilation on real hardware — the r3 int8-stage-1
lesson (CLAUDE.md): kernel f32 dots truncate operands to bf16 on chip
while interpret mode is exact, so no kernel ships without an on-chip
parity run.

    python -m tools.bn_tpu_check          # parity at every train BN shape
    python -m tools.bn_tpu_check bench    # reduction-only microbench vs XLA

Parity compares against the XLA f32 reference on the same chip (both
sides see the same bf16 inputs). The microbench scans the reduction with
per-step varied inputs and a full-output carry (relay methodology,
CLAUDE.md "Measurement gotchas").
"""

import json
import sys
import time

from mhentropy_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mhentropy_tpu.models import bn_pallas  # noqa: E402

# Every distinct (rows, C) the resnet50 B=32 @256px train step reduces.
SHAPES = [
    (32 * 128 * 128, 64),    # stem
    (32 * 64 * 64, 64),      # stage1 narrow
    (32 * 64 * 64, 256),     # stage1 wide
    (32 * 32 * 32, 128),     # stage2 narrow
    (32 * 32 * 32, 512),     # stage2 wide
    (32 * 16 * 16, 256),     # stage3 narrow
    (32 * 16 * 16, 1024),    # stage3 wide
    (32 * 8 * 8, 512),       # stage4 narrow
    (32 * 8 * 8, 2048),      # stage4 wide
]


def parity():
    """Both the kernel and XLA's f32 reduction are compared against a
    float64 HOST reference: pure f32 accumulation-order differences show
    up as similar-scale errors on both sides (the first run measured the
    kernel at 2e-5..2e-4 rel vs XLA on the cancellation-heavy sum(dy*x) —
    exactly the ordering-noise scale), while a Mosaic truncation bug
    (the r3 bf16-dot class) would blow the kernel side up by ~100x."""
    ok = True
    for m, c in SHAPES:
        key = jax.random.key(m + c)
        x = (jax.random.normal(key, (m, c)) * 1.7 + 0.3).astype(jnp.bfloat16)
        dy = (jax.random.normal(jax.random.fold_in(key, 1), (m, c))
              ).astype(jnp.bfloat16)
        s, ss = jax.jit(bn_pallas.stats_sums)(x)
        s1, sxy = jax.jit(bn_pallas.grad_sums)(dy, x)

        @jax.jit
        def xla_ref(x, dy):
            xf = x.astype(jnp.float32)
            dyf = dy.astype(jnp.float32)
            return (xf.sum(0), (xf * xf).sum(0), dyf.sum(0),
                    (dyf * xf).sum(0))

        rs, rss, rs1, rsxy = xla_ref(x, dy)
        x64 = np.asarray(x, np.float64)
        dy64 = np.asarray(dy, np.float64)
        gold = (x64.sum(0), (x64 * x64).sum(0), dy64.sum(0),
                (dy64 * x64).sum(0))
        row_ok = True
        rows = []
        for name, a, b, g in (("sum", s, rs, gold[0]),
                              ("sumsq", ss, rss, gold[1]),
                              ("dy", s1, rs1, gold[2]),
                              ("dyx", sxy, rsxy, gold[3])):
            scale = np.abs(g) + m * 1e-3  # sums over m terms of O(1)
            ek = float(np.max(np.abs(np.asarray(a) - g) / scale))
            ex = float(np.max(np.abs(np.asarray(b) - g) / scale))
            rows.append((name, ek, ex))
            # Kernel must sit in the same error family as XLA f32 (ordering
            # noise), far from a truncation blow-up.
            if ek > max(4.0 * ex, 1e-6) and ek > 1e-5:
                row_ok = False
        worst = max(rows, key=lambda r: r[1])
        print(f"M={m:7d} C={c:4d}  worst {worst[0]} kernel {worst[1]:.2e} "
              f"xla {worst[2]:.2e}  {'OK' if row_ok else 'FAIL'}")
        ok = ok and row_ok
    print(json.dumps({"parity_ok": ok}))
    return 0 if ok else 1


def bench():
    """ms per reduction pass, kernel vs XLA, biggest shape (the stem).

    Gotcha found the hard way (first version of this bench): perturbing a
    loop-invariant input with a broadcast scalar does NOT defeat hoisting
    for a REDUCTION — XLA distributes sum(x0 + u) = sum(x0) + u*numel and
    reads the tensor once ("8.7 TB/s"). The scan instead indexes a staged
    POOL of distinct inputs so every step must stream a real tensor."""
    m, c = SHAPES[0]
    steps, pool_n = 48, 8
    pool = (jax.random.normal(jax.random.key(0), (pool_n, m, c))
            ).astype(jnp.bfloat16)
    idxs = jnp.arange(steps) % pool_n
    res = {}
    for name, fn2 in (
        ("kernel_stats", lambda x: bn_pallas.stats_sums(x)),
        ("xla_stats", lambda x: (
            (xf := x.astype(jnp.float32)).sum(0), (xf * xf).sum(0))),
    ):
        @jax.jit
        def scan(pool, idxs, fn2=fn2):
            def body(carry, i):
                x = jax.lax.dynamic_index_in_dim(pool, i, 0, keepdims=False)
                a, b = fn2(x)
                return carry + a.sum() * 1e-20 + b.sum() * 1e-20, None

            out, _ = jax.lax.scan(body, 0.0, idxs)
            return out

        jax.block_until_ready(scan(pool, idxs))
        best = 1e9
        for r in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(scan(pool, jnp.roll(idxs, r)))
            best = min(best, (time.perf_counter() - t0) / steps)
        res[name] = round(best * 1e3, 4)
        gbps = m * c * 2 / best / 1e9
        res[name + "_gbps"] = round(gbps, 1)
    # Sanity: a v5e can't beat its ~819 GB/s HBM; past that the loop got
    # optimised away and the numbers are void.
    res["plausible"] = max(res["kernel_stats_gbps"],
                           res["xla_stats_gbps"]) < 900.0
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(bench() if "bench" in sys.argv[1:] else parity())
