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
