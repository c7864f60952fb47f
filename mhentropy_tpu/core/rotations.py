"""Batched rotation math, pure JAX.

Capability parity with the reference's rotation utilities
(/root/reference/hand/manopth/rodrigues_layer.py:15-54,
 /root/reference/hand/manopth/rot6d.py:4-51,
 /root/reference/hand/manopth/rotproj.py:4-21), re-derived from the math and
written vectorised for XLA (no Python loops over the batch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.lax import Precision

# Full-f32 contractions (platform default is the bf16 MXU path).
_einsum = functools.partial(jnp.einsum, precision=Precision.HIGH)


def quat_to_rotmat(quat: jax.Array) -> jax.Array:
    """Quaternion (w, x, y, z) -> rotation matrix.

    Args:
        quat: (..., 4), not necessarily normalised.

    Returns:
        (..., 3, 3) rotation matrices.
    """
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = jnp.moveaxis(quat, -1, 0)

    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z

    rows = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2.0 * (xy - wz), 2.0 * (wy + xz),
            2.0 * (wz + xy), w2 - x2 + y2 - z2, 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (wx + yz), w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return rows.reshape(*quat.shape[:-1], 3, 3)


def batch_rodrigues(axisang: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Axis-angle -> rotation matrix via the quaternion path.

    Matches the reference numerics (rodrigues_layer.py:43-54): the norm is
    taken of ``axisang + eps`` so the zero rotation is smooth/differentiable.

    Args:
        axisang: (..., 3) axis-angle vectors.

    Returns:
        (..., 3, 3) rotation matrices.
    """
    angle = jnp.linalg.norm(axisang + eps, axis=-1, keepdims=True)
    axis = axisang / angle
    half = angle * 0.5
    quat = jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)
    return quat_to_rotmat(quat)


def rotmat_from_6d(x6d: jax.Array, eps: float = 1e-8) -> jax.Array:
    """6D rotation representation -> rotation matrix (Zhou et al., CVPR'19).

    Args:
        x6d: (..., 6) = two stacked 3-vectors (a1, a2).

    Returns:
        (..., 3, 3) with COLUMNS [b1 | b2 | b3] formed by Gram-Schmidt +
        cross — the reference/ProHMR convention (rot6d.py:4-51 cats on
        dim=2). An earlier port stacked ROWS, i.e. returned the
        transpose; internally consistent, but released ProHMR-style
        checkpoints predicting standard column-convention 6D would have
        decoded every joint rotation as its inverse.
    """
    a1, a2 = x6d[..., :3], x6d[..., 3:]
    b1 = a1 / (jnp.linalg.norm(a1, axis=-1, keepdims=True) + eps)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / (jnp.linalg.norm(b2, axis=-1, keepdims=True) + eps)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def project_rotmat(mats: jax.Array) -> jax.Array:
    """Project arbitrary 3x3 matrices to the closest rotation (SVD, det +1).

    Batched equivalent of the reference's CPU-loop rotproj.py:4-21.
    """
    u, _, vt = jnp.linalg.svd(mats)
    det = jnp.sign(jnp.linalg.det(_einsum("...ij,...jk->...ik", u, vt)))
    fix = jnp.concatenate(
        [jnp.ones((*det.shape, 2)), det[..., None]], axis=-1
    )
    return _einsum("...ij,...j,...jk->...ik", u, fix, vt)


def posemap_axisang(pose_vectors: jax.Array):
    """Full-pose axis-angle -> (pose_map, rot_mats), flattened per joint.

    Equivalent of tensutils.th_posemap_axisang: converts a (B, 3*J) pose to
    per-joint rotation matrices (B, J, 3, 3) and the pose-blendshape features
    R - I flattened to (B, J*9).
    """
    b = pose_vectors.shape[0]
    nj = pose_vectors.shape[1] // 3
    rots = batch_rodrigues(pose_vectors.reshape(b, nj, 3))
    pose_map = (rots - jnp.eye(3)).reshape(b, nj * 9)
    return pose_map, rots
