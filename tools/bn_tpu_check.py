"""On-chip parity check for the fused train-mode BN reductions.

Interpret-mode tests (tests/test_bn_pallas.py) prove the math; this tool
proves the MOSAIC compilation on real hardware — the r3 int8-stage-1
lesson (CLAUDE.md): kernel f32 dots truncate operands to bf16 on chip
while interpret mode is exact, so no kernel ships without an on-chip
parity run.

    python -m tools.bn_tpu_check          # parity at every train BN shape

Parity compares the kernel AND the XLA f32 reduction against a float64
host reference on the same bf16 inputs. (Speed questions go through the
full train-step A/B — see the NOTE above __main__.)
"""

import json
import sys

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


# NOTE: a reduction-only microbench was built here TWICE and deleted
# (the tune_sampler precedent — delete rather than ship wrong):
#   1. loop-invariant input + broadcast-scalar perturbation: XLA
#      distributes sum(x0+u) = sum(x0) + u*N and hoists the entire read
#      ("8.7 TB/s");
#   2. a staged pool of 8 distinct inputs indexed per scan step: XLA
#      hoists all 8 reductions out of the loop ("35 TB/s") while the
#      pallas side pays a forced materialization of the dynamic slice
#      (7.5 GB/s) — neither number describes the in-model cost.
# Reduction timings are only meaningful inside the full train-step A/B
# (tools/bench_train.py MHENT_FUSED_BN=0|1|full) plus the xplane
# attribution (tools/profile_step.py train) — which is how the r5
# verdict in docs/PERF.md "BUILT, MEASURED, DISPROVEN" was reached.


if __name__ == "__main__":
    sys.exit(parity())
