"""Shared scaffolding for the fused flow-sampler kernels.

One copy of the VMEM-budget constants and padding helpers used by both
flow families (flows/pallas_sampler.py for RealNVP,
flows/pallas_glow_sampler.py for ConditionalGlow) — a budget fix applied
here reaches both kernels (the per-family `auto_images_per_tile` sizing
stays local: the resident-weight working sets differ).
"""

from __future__ import annotations

LANE = 128  # TPU lane width: last-dim tiles pad to multiples of this

# Conservative per-core VMEM working budget. The real v5e limit is
# ~128 MB of shared VMEM but the default scoped-vmem allocation is
# 16 MB — kernels that need more request it per-call via
# CompilerParams(vmem_limit_bytes=...) (the global flag measured SLOWER,
# CLAUDE.md).
VMEM_BYTES = 16 * 1024 * 1024


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def lane_pad_helpers(d: int, dp: int, dtype=None):
    """The (L, d/h, ...) lane-padding trio shared by both RealNVP fused
    kernels (pallas_sampler.pack_weights / pallas_sampler_int8.prepare_flow)
    — one definition so a padding-convention change cannot land in one
    kernel family only. Returns (pad_rows, pad_cols, pad_bias_d); when
    `dtype` is None the row/col pads keep the input dtype, the bias pad is
    always f32 (the kernels' accumulate dtype).

    pad_rows: (L, d, h) -> (L, dp, h); pad_cols: (L, h, d) -> (L, h, dp);
    pad_bias_d: (L, d) -> (L, 1, dp) f32.
    """
    import jax.numpy as jnp

    def pad_rows(w):
        w = jnp.pad(w, ((0, 0), (0, dp - d), (0, 0)))
        return w.astype(dtype) if dtype is not None else w

    def pad_cols(w):
        w = jnp.pad(w, ((0, 0), (0, 0), (0, dp - d)))
        return w.astype(dtype) if dtype is not None else w

    def pad_bias_d(b):
        return jnp.pad(b, ((0, 0), (0, dp - d)))[:, None, :].astype(
            jnp.float32)

    return pad_rows, pad_cols, pad_bias_d
