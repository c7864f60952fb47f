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
    s = mask_size
    px = (verts_uv + 1.0) / 2.0 * s  # pixel coords
    grid = (jnp.arange(s, dtype=jnp.float32) + 0.5)[None]
    dx2 = (px[..., 0:1] - grid) ** 2  # (B, V, S)
    dy2 = (px[..., 1:2] - grid) ** 2
    # Union of per-vertex Gaussians via log-sum trick:
    # 1 - prod_v (1 - g_v) == 1 - exp(sum_v log(1 - g_v)).
    gx = jnp.exp(-dx2 / (2 * sigma_px**2))
    gy = jnp.exp(-dy2 / (2 * sigma_px**2))
    # g_v(x, y) separable: log(1-g) is not; use sum-of-gaussians saturation
    # instead (cheap and monotone): mask = 1 - exp(-sum_v g_v).
    accum = jnp.einsum("bvy,bvx->byx", gy, gx)
    return 1.0 - jnp.exp(-accum)


@functools.partial(jax.jit, static_argnames=("mask_size",))
def splat_depth(
    verts_uv: jax.Array,
    verts_z: jax.Array,
    mask_size: int = 64,
    sigma_px: float = 1.5,
    background: float = 0.0,
) -> jax.Array:
    """Soft depth map: per-pixel softmin-depth over vertex splats.

    Args:
        verts_uv: (B, V, 2) in [-1, 1); verts_z: (B, V) metric depth
        (smaller = closer, the renderer convention after the axis flips in
        ManoLayer.render, :88-91).

    Returns:
        (B, S, S) depth, `background` where no splat reaches.
    """
    s = mask_size
    px = (verts_uv + 1.0) / 2.0 * s
    grid = (jnp.arange(s, dtype=jnp.float32) + 0.5)[None]
    gx = jnp.exp(-((px[..., 0:1] - grid) ** 2) / (2 * sigma_px**2))
    gy = jnp.exp(-((px[..., 1:2] - grid) ** 2) / (2 * sigma_px**2))
    # PER-PIXEL softmin over depth: weights w_v(pixel) * exp(-beta z_v),
    # normalised per pixel. (A global softmax over vertices made any
    # pixel covered only by non-frontmost vertices read depth ~0 — the
    # e^-beta*dz weight vanished against the denominator floor.) Both
    # sums stay SEPARABLE — no (B, V, S, S) intermediate (at mhent's
    # hypothesis-major rows that tensor would be ~40 GB).
    beta = 10.0
    zs = jnp.exp(-beta * (verts_z - verts_z.min(axis=1, keepdims=True)))
    denom = jnp.einsum("bvy,bvx,bv->byx", gy, gx, zs)
    num = jnp.einsum("bvy,bvx,bv->byx", gy, gx, zs * verts_z)
    # Floor just above f32 underflow: back-surface-only pixels carry
    # e^-beta*dz ~ 1e-26 scale weights that a 1e-8 floor would swamp.
    depth = num / jnp.maximum(denom, 1e-37)
    cover = 1.0 - jnp.exp(-jnp.einsum("bvy,bvx->byx", gy, gx))
    return jnp.where(cover > 0.5, depth, background)


def render_mods(
    verts_normed: jax.Array,
    logs_t: jax.Array,
    mods=("m",),
    mask_size: int = 64,
) -> dict:
    """The 'm'/'depth' render mods (network.py:528-557 made functional).

    Args:
        verts_normed: (R, V, 3) normalised-relative mesh vertices.
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
