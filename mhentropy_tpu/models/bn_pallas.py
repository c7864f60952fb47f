"""Fused train-mode BatchNorm stats/grad reductions as Pallas kernels.

VERDICT (r5, measured on chip): DISPROVEN — kept opt-in as the A/B
record. Both modes LOSE end to end (full 27.6 / stats-only 22.4 vs
flax-BN 19.9 ms/step, tools/bench_train.py): a Pallas call requires the
default row-major operand layout, so every kernelized BN inserts a
relayout copy of the full activation (xplane: 0.41 ms/step for the stem
alone) that XLA's native reduce fusions — which consume the tiled conv
layout in place — never pay; the full mode additionally materializes dy,
which XLA otherwise computes inline inside both bwd fusions. Numerics
are verified (interpret parity suite + tools/bn_tpu_check.py on-chip
f64-referenced check); the loss is purely structural. See docs/PERF.md
"BUILT, MEASURED, DISPROVEN".

Why it was built: the r4 train-step xplane attribution (docs/PERF.md
"Train step: the bwd long tail") showed the 14 BN
`convert_reduce_fusion`s — batch-stats in the forward plus the two
per-channel sums in the backward — moving their full activation tensors
at ~290 GB/s: XLA codegens the cross-row channel reduction as per-tile
VPU shuffles, well under the 819 GB/s DMA roofline. ~3.5 ms of the
19.96 ms train step sat in those reductions.

The fix is NOT a fused normalize (the elementwise work already fuses into
neighbouring convs); it is doing only the REDUCTIONS in kernels that read
each activation once at DMA rate and accumulate in f32 vregs:

  - `_stats_kernel`:  x            -> (sum x, sum x^2)      [forward]
  - `_reduce2_kernel`: (dy, x)     -> (sum dy, sum dy*x)    [backward]

`train_bn` wraps them in a custom_vjp whose elementwise pieces stay in
XLA (they fuse), with math matching flax's BatchNorm exactly:
use_fast_variance (var = E[x^2] - E[x]^2, clipped at 0), f32 stats from a
bf16 input, normalize in f32, output cast to the module dtype
(flax/linen/normalization.py `_compute_stats`/`_normalize` semantics).
`FusedTrainBN` is a drop-in flax module declaring its params/stats under
nn.BatchNorm's exact paths, so checkpoints and init RNG streams are
oblivious to which implementation runs (the `_StemBNParam` convention,
models/resnet.py).

Accelerates the training loop of the reference's
CrossModalHand.py:455-470; layout notes: activations are NHWC with C on
the lanes, rows are N*H*W. C=64 tensors fold two rows into one 128-lane
row (a free row-major reshape) so every kernel runs with full lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Per-input VMEM budget for one grid step (bytes). Two inputs in the grad
# kernel => ~4 MiB live blocks + f32 accumulators; well inside the 16 MiB
# default scoped-vmem window, so no CompilerParams override needed.
_BLOCK_BYTES = 2 * 1024 * 1024


def _fold(m: int, c: int) -> tuple[int, int]:
    """Fold rows into lanes until C >= 128 (row-major reshape is free)."""
    while c < 128 and m % 2 == 0:
        m //= 2
        c *= 2
    return m, c


def _block_rows(m: int, c: int, itemsize: int) -> int:
    """Largest power-of-two row count that divides m and fits the budget."""
    budget = max(8, _BLOCK_BYTES // (c * itemsize))
    r = 1
    while r < budget and m % (2 * r) == 0 and 2 * r <= m:
        r *= 2
    return r


def _backend_ok() -> bool:
    """Kernels compile on TPU only (pallas_call on CPU raises unless
    interpret mode — the test suite monkeypatches this predicate to reach
    the kernel path under its interpret-mode fixture, like every sibling
    kernel's backend gate)."""
    return jax.default_backend() == "tpu"


def supported(x: jax.Array) -> bool:
    """Kernel applies: TPU backend, float input, feature-last, lanes
    fillable, and the row count splits into power-of-two blocks of at
    least 8. Off-TPU the module falls back to the flax-identical XLA
    stats (confirmed crash otherwise: CPU pallas_call only supports
    interpret mode)."""
    if not _backend_ok():
        return False
    if x.ndim < 2 or not jnp.issubdtype(x.dtype, jnp.floating):
        return False
    c = x.shape[-1]
    m = 1
    for s in x.shape[:-1]:
        m *= s
    if m == 0 or c == 0:
        return False
    m, c = _fold(m, c)
    if c < 128 or c % 128 != 0 or c > 4096:
        return False
    return _block_rows(m, c, jnp.dtype(x.dtype).itemsize) >= 8


def _stats_kernel(x_ref, sum_ref, sumsq_ref):
    import jax.experimental.pallas as pl

    blk = x_ref[...].astype(jnp.float32)
    part = jnp.sum(blk, axis=0, keepdims=True)
    part2 = jnp.sum(blk * blk, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        sum_ref[...] = part
        sumsq_ref[...] = part2

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        sum_ref[...] += part
        sumsq_ref[...] += part2


def _reduce2_kernel(dy_ref, x_ref, s1_ref, sxy_ref):
    import jax.experimental.pallas as pl

    dy = dy_ref[...].astype(jnp.float32)
    x = x_ref[...].astype(jnp.float32)
    part = jnp.sum(dy, axis=0, keepdims=True)
    part2 = jnp.sum(dy * x, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        s1_ref[...] = part
        sxy_ref[...] = part2

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        s1_ref[...] += part
        sxy_ref[...] += part2


def _row_call(kernel, args, c: int):
    """Run a row-reduction kernel over (M, C)-shaped args; (1, C) f32 outs."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = args[0].shape[0]
    rows = _block_rows(m, c, jnp.dtype(args[0].dtype).itemsize)
    grid = m // rows
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in args
        ],
        out_specs=[
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(2)
        ],
        out_shape=[jax.ShapeDtypeStruct((1, c), jnp.float32)
                   for _ in range(2)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential accumulation
        ),
    )(*args)


def _sums(kernel, arrs, features: int):
    """Flatten feature-last arrays, fold lanes, reduce, unfold: (C,) f32."""
    m = arrs[0].size // features
    mf, cf = _fold(m, features)
    flat = [a.reshape(mf, cf) for a in arrs]
    outs = _row_call(kernel, flat, cf)
    k = cf // features
    return tuple(o.reshape(k, features).sum(axis=0) for o in outs)


def stats_sums(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(sum x, sum x^2) over all leading axes, f32, one DMA-rate pass."""
    return _sums(_stats_kernel, [x], x.shape[-1])


def grad_sums(dy: jax.Array, x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(sum dy, sum dy*x) over all leading axes, f32, one DMA-rate pass."""
    return _sums(_reduce2_kernel, [dy, x], x.shape[-1])


# ----------------------------------------------------------------- train BN


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def train_bn(x, scale, bias, eps: float, out_dtype):
    """Train-mode BN with kernel reductions. Returns (y, mean, var);
    mean/var are f32 (C,) for the caller's running-average update."""
    y, mean, var, _ = _train_bn_fwd_impl(x, scale, bias, eps, out_dtype)
    return y, mean, var


def _train_bn_fwd_impl(x, scale, bias, eps, out_dtype):
    m = x.size // x.shape[-1]
    s, ss = stats_sums(x)
    mean = s / m
    # flax use_fast_variance semantics incl. the roundoff clip.
    var = jnp.maximum(0.0, ss / m - mean * mean)
    rstd = jax.lax.rsqrt(var + eps)
    xf = x.astype(jnp.float32)
    y = ((xf - mean) * (rstd * scale) + bias).astype(out_dtype)
    return y, mean, var, rstd


def _train_bn_fwd(x, scale, bias, eps, out_dtype):
    y, mean, var, rstd = _train_bn_fwd_impl(x, scale, bias, eps, out_dtype)
    return (y, mean, var), (x, mean, rstd, scale)


def _train_bn_bwd(eps, out_dtype, res, cts):
    del eps, out_dtype
    x, mean, rstd, scale = res
    dy, dmean_ct, dvar_ct = cts
    m = x.size // x.shape[-1]
    s1, sxy = grad_sums(dy, x)
    # sum(dy * xhat) from the raw sums: xhat = (x - mean) * rstd.
    s2 = (sxy - mean * s1) * rstd
    dscale = s2
    dbias = s1
    xf = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    xhat = (xf - mean) * rstd
    # d/dx of the normalize (standard BN backward), plus the mean/var
    # cotangent terms — the running-average update consumes (mean, var) as
    # aux outputs (zero cotangent under value_and_grad(has_aux=True)), but
    # a caller differentiating through them still gets the exact answer.
    dx = (rstd * scale) * (dyf - s1 / m - xhat * (s2 / m))
    dx = dx + dmean_ct / m + dvar_ct * (2.0 / m) * (xf - mean)
    return dx.astype(x.dtype), dscale, dbias


train_bn.defvjp(_train_bn_fwd, _train_bn_bwd)


# ------------------------------------------------------- stats-only mode
#
# The full-custom_vjp path above measured a LOSS on chip (27.6 vs 19.9
# ms/step, r5 A/B): the custom call forces dy — which XLA otherwise
# computes inline inside both bwd fusions and never materializes — plus
# the x residual into HBM, and that extra traffic swamps the reduce-rate
# win. This mode kernelizes ONLY the forward stats pass: the backward of
# (sum x, sum x^2) is a trivial broadcast (dx = ds + 2x*dss) that XLA
# fuses into the surrounding bwd graph, so autodiff's backward structure
# — including its inline dy fusions — is untouched.


@jax.custom_vjp
def stats_sums_diff(x):
    return stats_sums(x)


def _ss_fwd(x):
    return stats_sums(x), x


def _ss_bwd(x, cts):
    ds, dss = cts
    dx = ds + 2.0 * x.astype(jnp.float32) * dss
    return (dx.astype(x.dtype),)


stats_sums_diff.defvjp(_ss_fwd, _ss_bwd)


import flax.linen as nn  # noqa: E402  (kept below the kernel half)


class FusedTrainBN(nn.Module):
    """nn.BatchNorm-compatible module: same param/variable paths
    ('scale'/'bias' params, 'batch_stats' {mean, var}), same stats and
    normalize math; train-mode reductions run in the Pallas kernels when
    `supported`, with a flax-identical XLA fallback otherwise."""

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: object = None
    # "stats": kernelize only the forward stats reduction (autodiff bwd
    # untouched). "full": the whole custom_vjp (measured LOSS on chip —
    # kept for the A/B record, see the module comment above).
    mode: str = "stats"

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda s: jnp.zeros(s, jnp.float32), (features,))
        ra_var = self.variable(
            "batch_stats", "var",
            lambda s: jnp.ones(s, jnp.float32), (features,))
        scale = self.param("scale", nn.initializers.ones,
                           (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (features,), jnp.float32)
        out_dtype = self.dtype if self.dtype is not None else \
            jnp.promote_types(x.dtype, jnp.float32)
        if self.mode not in ("stats", "full"):
            # Loud, not a silent stats fallback: 'Full'/'ful' typos would
            # otherwise run stats mode while the A/B record says 'full' —
            # the misattribution class this repo raises for elsewhere.
            raise ValueError(
                f"FusedTrainBN mode {self.mode!r}; expected 'stats'|'full'")

        def normalize(mean, var):
            # ONE normalize block (flax _normalize semantics: f32 math,
            # cast at the end) shared by eval / stats-kernel / fallback.
            mul = jax.lax.rsqrt(var + self.epsilon) * scale
            return ((x.astype(jnp.float32) - mean) * mul
                    + bias).astype(out_dtype)

        if self.use_running_average:
            return normalize(ra_mean.value, ra_var.value)

        use_kernel = supported(x) and not self.is_initializing()
        if use_kernel and self.mode == "full":
            y, mean, var = train_bn(x, scale, bias, self.epsilon, out_dtype)
        else:
            m_count = x.size // features
            if use_kernel:
                s, ss = stats_sums_diff(x)
                mean, mu2 = s / m_count, ss / m_count
            else:
                # flax _compute_stats, verbatim semantics.
                xf = x.astype(jnp.float32)
                axes = tuple(range(x.ndim - 1))
                mean, mu2 = jnp.mean(xf, axes), jnp.mean(xf * xf, axes)
            var = jnp.maximum(0.0, mu2 - mean * mean)
            y = normalize(mean, var)
        if not self.is_initializing():
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1.0 - self.momentum) * mean)
            ra_var.value = (self.momentum * ra_var.value
                            + (1.0 - self.momentum) * var)
        return y
