"""Differentiable silhouette / depth splatting renderer, pure JAX.

The reference's mask/depth render path is DEAD CODE: neural_renderer is
commented out (hand/ManoLayer.py:7,40) and the 'm'/'depth' mods would crash
(network.py:552-557 always passes render=[]). This module makes that
capability real with a TPU-friendly design: instead of rasterising triangles
(data-dependent control flow), vertices are splatted as Gaussians onto the
mask grid — one (V, H*W) distance matrix per image, a pure einsum/reduction
pipeline that XLA tiles well, fully differentiable w.r.t. the vertices.

Silhouettes from Gaussian splats are a standard soft-rasterisation surrogate;
at MANO's vertex density (778 verts on a 64^2 grid) the soft union is a
faithful hand mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Splat accumulations feed the use_mask_loss gradient: parity-critical
# contraction precision per the repo rule (default MXU dots truncate
# operands to bf16 on TPU; the CPU test backend is f32-exact at every
# setting, so only HIGH keeps tests representative of the chip).
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGH)


def _gaussians(verts_uv: jax.Array, s: int, sigma_px: float):
    """Separable per-axis Gaussian splat factors: (gy, gx), each (B, V, S)."""
    px = (verts_uv + 1.0) / 2.0 * s  # pixel coords
    grid = (jnp.arange(s, dtype=jnp.float32) + 0.5)[None]
    gx = jnp.exp(-((px[..., 0:1] - grid) ** 2) / (2 * sigma_px**2))
    gy = jnp.exp(-((px[..., 1:2] - grid) ** 2) / (2 * sigma_px**2))
    return gy, gx


@functools.partial(jax.jit, static_argnames=("mask_size",))
def splat_silhouette(
    verts_uv: jax.Array,
    mask_size: int = 64,
    sigma_px: float = 1.5,
) -> jax.Array:
    """Soft silhouette from projected vertices.

    Args:
        verts_uv: (B, V, 2) in [-1, 1) crop coordinates.
        mask_size: output resolution (the reference's mask_sz=64,
            ManoLayer.py:14).

    Returns:
        (B, S, S) soft mask in [0, 1].
    """
    gy, gx = _gaussians(verts_uv, mask_size, sigma_px)
    # Union of per-vertex Gaussians. g_v(x, y) is separable but log(1-g)
    # is not; use sum-of-gaussians saturation instead (cheap, monotone):
    # mask = 1 - exp(-sum_v g_v).
    accum = _einsum("bvy,bvx->byx", gy, gx)
    return 1.0 - jnp.exp(-accum)


@functools.partial(jax.jit, static_argnames=("mask_size",))
def splat_depth(
    verts_uv: jax.Array,
    verts_z: jax.Array,
    mask_size: int = 64,
    sigma_px: float = 1.5,
    background: float = 0.0,
    beta: float = 10.0,
) -> jax.Array:
    """Soft depth map: per-pixel softmin-depth over vertex splats.

    Args:
        verts_uv: (B, V, 2) in [-1, 1); verts_z: (B, V) depth, smaller =
            closer (the renderer convention after the axis flips in
            ManoLayer.render, :88-91), in units where beta*extent is O(10):
            the shipped caller (render_mods) passes BONE-NORMALISED z
            (range ~±2), for which the default beta=10 separates front
            from back surface cleanly. Metric units need a matching beta
            (metres: hand extent ~0.1 -> beta ~100; millimetres: ~0.1) —
            too small and the "softmin" blends front and back, too large
            and the weights underflow f32 against the denominator floor.

    Returns:
        (B, S, S) depth, `background` where no splat reaches.
    """
    gy, gx = _gaussians(verts_uv, mask_size, sigma_px)
    # PER-PIXEL softmin over depth: weights w_v(pixel) * exp(-beta z_v),
    # normalised per pixel. (A global softmax over vertices made any
    # pixel covered only by non-frontmost vertices read depth ~0 — the
    # e^-beta*dz weight vanished against the denominator floor.) Both
    # sums stay SEPARABLE — no (B, V, S, S) intermediate (at mhent's
    # hypothesis-major rows that tensor would be ~40 GB).
    zs = jnp.exp(-beta * (verts_z - verts_z.min(axis=1, keepdims=True)))
    denom = _einsum("bvy,bvx,bv->byx", gy, gx, zs)
    num = _einsum("bvy,bvx,bv->byx", gy, gx, zs * verts_z)
    # Floor just above f32 underflow: back-surface-only pixels carry
    # e^-beta*dz ~ 1e-26 scale weights that a 1e-8 floor would swamp.
    depth = num / jnp.maximum(denom, 1e-37)
    cover = 1.0 - jnp.exp(-_einsum("bvy,bvx->byx", gy, gx))
    return jnp.where(cover > 0.5, depth, background)


def render_mods(
    verts_normed: jax.Array,
    logs_t: jax.Array,
    mods=("m",),
    mask_size: int = 64,
) -> dict:
    """The 'm'/'depth' render mods (network.py:528-557 made functional).

    Args:
        verts_normed: (R, V, 3) normalised-relative mesh vertices (the
            bone-normalised z range splat_depth's default beta expects).
        logs_t: (R, 3) orthographic camera (log s, tx, ty).
    """
    from mhentropy_tpu.core import camera

    uv = camera.orth_project(
        verts_normed, jnp.exp(logs_t[:, 0:1]), logs_t[:, 1:3],
        inv_norm=False,
    )  # one weak-perspective convention for renderer + uv heads
    out = {}
    if "m" in mods:
        out["mask"] = splat_silhouette(uv, mask_size)
    if "depth" in mods:
        out["depth"] = splat_depth(uv, verts_normed[..., 2], mask_size)
    return out
