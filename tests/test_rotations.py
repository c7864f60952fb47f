import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as R

from mhentropy_tpu.core import rotations


def test_batch_rodrigues_matches_scipy():
    rng = np.random.RandomState(0)
    aa = rng.randn(64, 3).astype(np.float32)
    ours = np.asarray(rotations.batch_rodrigues(jnp.asarray(aa)))
    ref = R.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_batch_rodrigues_zero_rotation_is_identity_and_differentiable():
    aa = jnp.zeros((4, 3))
    mats = rotations.batch_rodrigues(aa)
    np.testing.assert_allclose(np.asarray(mats), np.tile(np.eye(3), (4, 1, 1)), atol=1e-4)
    grads = jax.grad(lambda a: jnp.sum(rotations.batch_rodrigues(a)))(aa)
    assert np.all(np.isfinite(np.asarray(grads)))


def test_quat_to_rotmat_orthonormal():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(32, 4).astype(np.float32))
    mats = np.asarray(rotations.quat_to_rotmat(q))
    eye = np.einsum("bij,bkj->bik", mats, mats)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(mats), 1.0, atol=1e-5)


def test_rotmat_from_6d_recovers_rotation():
    rng = np.random.RandomState(2)
    ref = R.random(16, random_state=rng).as_matrix().astype(np.float32)
    # First two COLUMNS — the reference/ProHMR convention (rot6d.py
    # cats on dim=2); the row encoding belonged to the transposed port.
    x6d = np.swapaxes(ref, -1, -2)[:, :2, :].reshape(16, 6)
    ours = np.asarray(rotations.rotmat_from_6d(jnp.asarray(x6d)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_project_rotmat():
    rng = np.random.RandomState(3)
    noisy = R.random(8, random_state=rng).as_matrix() + rng.randn(8, 3, 3) * 0.05
    proj = np.asarray(rotations.project_rotmat(jnp.asarray(noisy.astype(np.float32))))
    eye = np.einsum("bij,bkj->bik", proj, proj)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(proj), 1.0, atol=1e-5)


def test_posemap_axisang_shapes():
    pose = jnp.asarray(np.random.RandomState(4).randn(2, 48).astype(np.float32))
    pose_map, rots = rotations.posemap_axisang(pose)
    assert pose_map.shape == (2, 16 * 9)
    assert rots.shape == (2, 16, 3, 3)
    # pose_map is R - I flattened.
    np.testing.assert_allclose(
        np.asarray(pose_map).reshape(2, 16, 3, 3),
        np.asarray(rots) - np.eye(3),
        atol=1e-6,
    )


def test_reference_gradcheck_equivalent():
    """The reference's one genuine numeric test is autograd gradcheck of
    batch_rodrigues (rodrigues_layer.py:63-89); mirror it with jax.test_util."""
    from jax.test_util import check_grads

    aa = jnp.asarray(np.random.RandomState(5).rand(2, 3).astype(np.float32))
    check_grads(rotations.batch_rodrigues, (aa,), order=1, modes=("rev",), atol=1e-2, rtol=1e-2)
