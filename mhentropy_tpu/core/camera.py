"""Camera / coordinate transforms, pure JAX.

Capability parity with the reference's coordinate toolbox
(/root/reference/hand/utils.py:21-66,129-182,502-606,
 /root/reference/hand/ManoLayer.py:150-165,
 /root/reference/hand/dataloader/rhddataloader.py:237-269), re-derived and
vectorised (no per-sample Python loops).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.lax import Precision

# Full-f32 contractions (platform default is the bf16 MXU path).
_einsum = functools.partial(jnp.einsum, precision=Precision.HIGH)


def batch_normalize_pose3d(
    pose3d: jax.Array,
    root_idx: int,
    norm_idx: int | None = None,
    return_st: bool = False,
):
    """Root-relative + bone-normalised 3D pose.

    Args:
        pose3d: (B, K, 3).
        root_idx: joint subtracted as origin.
        norm_idx: joint whose (root-relative) length normalises the scale.

    Returns:
        normalised pose (B, K, 3); optionally also (root (B,1,3),
        bone_length (B,)).
    """
    root = pose3d[:, root_idx : root_idx + 1, :]
    rel = pose3d - root
    if norm_idx is not None:
        bone = jnp.sqrt(jnp.sum(rel[:, norm_idx, :] ** 2, -1))
        out = rel / bone[:, None, None]
    else:
        bone = jnp.ones(pose3d.shape[0], pose3d.dtype)
        out = rel
    if return_st:
        return out, root, bone
    return out


def orth_project(
    xyz: jax.Array,
    scale: jax.Array,
    trans: jax.Array,
    image_size: int = 256,
    inv_norm: bool = True,
) -> jax.Array:
    """Orthographic projection ``uv = s * xyz[..., :2] + t``.

    Args:
        xyz: (..., K, 3) normalised-relative 3D pose.
        scale: (..., 1) positive camera scale.
        trans: (..., 2) camera translation (in [-1, 1) crop coords).
        inv_norm: map [-1, 1) -> pixel space [0, image_size).
    """
    uv = scale[..., None, :] * xyz[..., :2] + trans[..., None, :]
    if inv_norm:
        uv = (uv + 1.0) / 2.0 * image_size
    return uv


def procrustes_align(mtx1: jax.Array, mtx2: jax.Array, return_trafo: bool = False):
    """Similarity-transform alignment of mtx2 onto mtx1 (per batch element).

    Same optimality criterion as scipy.linalg.orthogonal_procrustes applied to
    the centred, Frobenius-normalised point sets (utils.py:502-525), solved
    with one batched SVD on-device.

    Args:
        mtx1, mtx2: (..., K, D) point sets.

    Returns:
        aligned mtx2; with return_trafo also (R, s, s1, s2, t1, t2).
    """
    t1 = mtx1.mean(-2, keepdims=True)
    t2 = mtx2.mean(-2, keepdims=True)
    a = mtx1 - t1
    b = mtx2 - t2
    s1 = jnp.linalg.norm(a, axis=(-2, -1), keepdims=True) + 1e-8
    s2 = jnp.linalg.norm(b, axis=(-2, -1), keepdims=True) + 1e-8
    a = a / s1
    b = b / s2
    # orthogonal_procrustes(a, b): R = argmax tr(R^T a^T b) = u @ vt of a^T b,
    # s = sum of singular values.
    u, sv, vt = jnp.linalg.svd(_einsum("...ki,...kj->...ij", a, b))
    r = _einsum("...ij,...jk->...ik", u, vt)
    s = jnp.sum(sv, axis=-1)[..., None, None]
    aligned = _einsum("...ki,...ji->...kj", b, r) * s * s1 + t1
    if return_trafo:
        return aligned, r, s, s1, s2, t1, t2
    return aligned


def compute_st(pose3d: jax.Array, crop_uv: jax.Array) -> jax.Array:
    """Fit the orthographic camera (s, t) with uv = s*xyz[:, :2] + t.

    Procrustes fit restricted to scale+translation, matching the reference's
    compute_st (rhddataloader.py:237-269) which discards the rotation.

    Args:
        pose3d: (B, K, 3) normalised-relative pose.
        crop_uv: (B, K, 2) in [-1, 1).

    Returns:
        st: (B, 3) = (s, tx, ty).
    """
    _, _, s, s1, s2, t1, t2 = procrustes_align(
        crop_uv, pose3d[..., :2], return_trafo=True
    )
    scale = (s * s1 / s2)[..., 0, 0]
    t = -t2[..., 0, :] / s2[..., 0, :] * s[..., 0, :] * s1[..., 0, :] + t1[..., 0, :]
    return jnp.concatenate([scale[..., None], t], axis=-1)


def uvd_to_xyz(uvd: jax.Array, k_mat: jax.Array) -> jax.Array:
    """Perspective back-projection (utils.py:528-537).

    Args:
        uvd: (B, K, 3) pixel coords + metric depth.
        k_mat: (B, 3, 3) camera intrinsics.
    """
    fx = k_mat[:, 0, 0][:, None, None]
    fy = k_mat[:, 1, 1][:, None, None]
    u0 = k_mat[:, 0, 2][:, None, None]
    v0 = k_mat[:, 1, 2][:, None, None]
    u, v, z = uvd[..., 0:1], uvd[..., 1:2], uvd[..., 2:3]
    x = (u - u0) * z / fx
    y = (v - v0) * z / fy
    return jnp.concatenate([x, y, z], -1)


def xyz_to_uvd(xyz: jax.Array, k_mat: jax.Array) -> jax.Array:
    """Perspective projection, inverse of uvd_to_xyz."""
    proj = _einsum("bij,bkj->bki", k_mat, xyz)
    uv = proj[..., :2] / (proj[..., 2:3] + 1e-16)
    return jnp.concatenate([uv, xyz[..., 2:3]], -1)


def relocate_uv(
    uv: jax.Array, crop_center: jax.Array, resized_size: int, crop_scale: jax.Array
) -> jax.Array:
    """Full-image uv -> crop uv (utils.py:178-182)."""
    return (uv - crop_center[:, None, :]) * crop_scale[:, None, None] + resized_size // 2


def crop_to_original_uv(
    uv: jax.Array,
    crop_center: jax.Array,
    crop_size: jax.Array,
    hand_side: jax.Array,
    resized_size: int,
) -> jax.Array:
    """Crop-space uv -> original-image uv, undoing the left-hand flip
    (utils.py:540-557), branch-free.

    KNOWN REFERENCE INCONSISTENCY (ported faithfully): the un-flip here is
    `resized_size - u` (utils.py's convention) while the loaders flip with
    `(size - 1) - u` (augment.py:44's `255 - uv`, data/transforms.py) — a
    constant 1 px u offset on every left-hand sample between a crop-space
    prediction mapped back and the loader's own crop_uv target. Kept so
    metrics match the reference bit-for-bit; fix BOTH sides together if
    ever changed."""
    u = jnp.where(hand_side[:, None] > 0.5, resized_size - uv[..., 0], uv[..., 0])
    uv = jnp.stack([u, uv[..., 1]], -1)
    scale = (2.0 * crop_size / resized_size)[:, None, None]
    return (uv - resized_size / 2.0) * scale + crop_center[:, None, :]


def xyz_to_crop(
    pose3d: jax.Array,
    target: dict,
    resized_size: int = 256,
    root_idx: int = 12,
    norm_idx: int = 11,
):
    """Scale-normalised 3D pose -> crop-space uv + normalised depth
    (utils.py:129-175 'xyz2crop', vectorised, branch-free hand-side flip).

    Args:
        pose3d: (B, K, 3) or (B, 3K) scale-normalised pose.
        target: crop_center (B,2), crop_size (B,), hand_side (B,) or (B,2),
            bone_length (B,), pose3d_root (B,3), camera (B,3,3).
    """
    b = pose3d.shape[0]
    pose3d = pose3d.reshape(b, -1, 3)
    pose3d = pose3d - pose3d[:, root_idx : root_idx + 1]
    bone = target["bone_length"]
    pose3d = pose3d * bone[:, None, None] + target["pose3d_root"][:, None, :]
    uvd = xyz_to_uvd(pose3d, target["camera"])
    crop_d = batch_normalize_pose3d(pose3d, root_idx, norm_idx)[..., 2:3]
    crop_scale = resized_size / (target["crop_size"] * 2.0)
    crop_uv = relocate_uv(uvd[..., :2], target["crop_center"], resized_size, crop_scale)
    side = target["hand_side"]
    if side.ndim == 2:
        side = side[:, 0]
    # > 0.5, not == 1.0: the inverse (crop_to_original_uv) uses > 0.5, and
    # a side flag that went through low-precision arithmetic must flip (or
    # not) identically in both directions for the round-trip to hold.
    u = jnp.where(side[:, None] > 0.5, resized_size - crop_uv[..., 0], crop_uv[..., 0])
    crop_uv = jnp.stack([u, crop_uv[..., 1]], -1)
    return crop_uv, crop_d


def crop_to_xyz(
    uv_crop: jax.Array,
    norm_depth: jax.Array,
    target: dict,
    resized_size: int = 256,
    uv_norm: bool = False,
):
    """Crop-space uv + normalised depth -> metric xyz (utils.py:560-606
    'crop2xyz', perspective path), undoing rotation augmentation, the crop,
    and the left-hand flip, all vectorised.

    Returns:
        (uv_original (B,K,2), xyz (B,K,3) metres).
    """
    b = uv_crop.shape[0]
    uv = uv_crop.reshape(b, -1, 2)
    if uv_norm:
        uv = (uv + 1.0) / 2.0 * resized_size
    ones = jnp.ones((*uv.shape[:2], 1), uv.dtype)
    uv_unrot = _einsum(
        "bki,bij->bkj", jnp.concatenate([uv, ones], -1), target["rot_mat_inv"]
    )
    side = target["hand_side"]
    if side.ndim == 2:
        side = (side[:, 0] == 1.0).astype(uv.dtype)
    uv_orig = crop_to_original_uv(
        uv_unrot, target["crop_center"], target["crop_size"], side, resized_size
    )
    depth = (
        norm_depth.reshape(b, -1, 1) * target["bone_length"][:, None, None]
        + target["pose3d_root"][:, 2][:, None, None]
    ) * 1000.0
    uvd = jnp.concatenate([uv_orig, depth], -1)
    xyz = uvd_to_xyz(uvd, target["camera"]) / 1000.0
    return uv_orig, xyz
