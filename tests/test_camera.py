import jax.numpy as jnp
import numpy as np
from scipy.linalg import orthogonal_procrustes

from mhentropy_tpu.core import camera


def _ref_align_w_scale(mtx1, mtx2):
    """Reference Procrustes (utils.py:502-525) recomputed with scipy."""
    t1, t2 = mtx1.mean(0), mtx2.mean(0)
    a, b = mtx1 - t1, mtx2 - t2
    s1 = np.linalg.norm(a) + 1e-8
    s2 = np.linalg.norm(b) + 1e-8
    a, b = a / s1, b / s2
    r, s = orthogonal_procrustes(a, b)
    return (b @ r.T) * s * s1 + t1, r, s, s1, s2, t1, t2


def test_procrustes_align_matches_scipy():
    rng = np.random.RandomState(0)
    for _ in range(4):
        m1 = rng.randn(21, 3).astype(np.float32)
        m2 = rng.randn(21, 3).astype(np.float32)
        ref, *_ = _ref_align_w_scale(m1, m2)
        ours = np.asarray(
            camera.procrustes_align(jnp.asarray(m1)[None], jnp.asarray(m2)[None])
        )[0]
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_compute_st_recovers_orthographic_camera():
    """uv generated with a known (s, t) must be recovered exactly (up to the
    rotation-free residual, zero here)."""
    rng = np.random.RandomState(1)
    pose = rng.randn(4, 21, 3).astype(np.float32)
    s_true = rng.uniform(0.2, 0.6, (4, 1)).astype(np.float32)
    t_true = rng.uniform(-0.3, 0.3, (4, 2)).astype(np.float32)
    uv = pose[..., :2] * s_true[:, None] + t_true[:, None]
    st = np.asarray(camera.compute_st(jnp.asarray(pose), jnp.asarray(uv)))
    np.testing.assert_allclose(st[:, 0], s_true[:, 0], rtol=1e-3)
    np.testing.assert_allclose(st[:, 1:], t_true, atol=1e-3)


def test_batch_normalize_pose3d_roundtrip():
    rng = np.random.RandomState(2)
    pose = jnp.asarray(rng.randn(8, 21, 3).astype(np.float32))
    normed, root, bone = camera.batch_normalize_pose3d(pose, 12, 11, return_st=True)
    # Root joint is the origin; norm joint has unit length.
    np.testing.assert_allclose(np.asarray(normed)[:, 12], 0.0, atol=1e-6)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(normed)[:, 11], axis=-1), 1.0, atol=1e-5
    )
    # Invert.
    recon = np.asarray(normed) * np.asarray(bone)[:, None, None] + np.asarray(root)
    np.testing.assert_allclose(recon, np.asarray(pose), atol=1e-5)


def test_orth_project_pixel_space():
    xyz = jnp.zeros((2, 21, 3))
    uv = camera.orth_project(xyz, jnp.ones((2, 1)), jnp.zeros((2, 2)), 256, inv_norm=True)
    np.testing.assert_allclose(np.asarray(uv), 128.0)


def test_perspective_roundtrip():
    rng = np.random.RandomState(3)
    k = np.tile(np.array([[500.0, 0, 128], [0, 500.0, 128], [0, 0, 1]], np.float32), (2, 1, 1))
    xyz = rng.uniform(0.2, 1.0, (2, 21, 3)).astype(np.float32)
    uvd = camera.xyz_to_uvd(jnp.asarray(xyz), jnp.asarray(k))
    back = camera.uvd_to_xyz(uvd, jnp.asarray(k))
    np.testing.assert_allclose(np.asarray(back), xyz, rtol=1e-5, atol=1e-6)


def test_crop_to_original_uv_flip():
    uv = jnp.full((2, 21, 2), 100.0)
    center = jnp.full((2, 2), 128.0)
    size = jnp.full((2,), 128.0)
    side = jnp.asarray([0.0, 1.0])
    out = np.asarray(camera.crop_to_original_uv(uv, center, size, side, 256))
    # no flip: (100-128)*1 + 128 = 100; flip: (156-128)*1 + 128 = 156
    np.testing.assert_allclose(out[0, :, 0], 100.0)
    np.testing.assert_allclose(out[1, :, 0], 156.0)
    np.testing.assert_allclose(out[:, :, 1], 100.0)
