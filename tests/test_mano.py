import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mhentropy_tpu.core import mano, skeletons
from mhentropy_tpu.core.mano import ManoConfig


@pytest.fixture(scope="module")
def model():
    return mano.synthetic_mano_model(seed=0)


def test_shapes(model):
    theta = jnp.zeros((3, 48))
    beta = jnp.zeros((3, 10))
    verts, joints = mano.mano_forward(model, theta, beta)
    assert verts.shape == (3, 778, 3)
    assert joints.shape == (3, 21, 3)


def test_zero_pose_flat_mean_is_rest_pose(model):
    """With flat_hand_mean and zero pose, LBS must reproduce the shaped
    template exactly (all joint transforms are pure translations)."""
    cfg = ManoConfig(flat_hand_mean=True, center_idx=None)
    beta = jnp.zeros((1, 10))
    verts, joints = mano.mano_forward(model, jnp.zeros((1, 48)), beta, cfg)
    np.testing.assert_allclose(
        np.asarray(verts)[0] / 1000.0, np.asarray(model.v_template), atol=1e-5
    )
    # Chain joints equal the regressed rest joints.
    rest_j = np.asarray(
        jnp.einsum("jv,vd->jd", model.j_regressor, model.v_template)
    )
    chain16 = np.asarray(joints)[0][
        np.argsort(skeletons.MANOCHAIN2VIZ)[:16]
    ]  # undo viz reorder, drop tips
    # Recover MANO-order 16 chain joints from the viz-ordered 21.
    inv = np.zeros(21, np.int64)
    inv[skeletons.MANOCHAIN2VIZ] = np.arange(21)
    chain16 = np.asarray(joints)[0][inv[:16]]
    np.testing.assert_allclose(chain16 / 1000.0, rest_j, atol=1e-5)


def test_global_rotation_equivariance(model):
    """Rotating only the root must rigidly rotate joints about the wrist."""
    from scipy.spatial.transform import Rotation as R

    cfg = ManoConfig(flat_hand_mean=True, center_idx=None)
    beta = jnp.zeros((1, 10))
    _, j0 = mano.mano_forward(model, jnp.zeros((1, 48)), beta, cfg)
    aa = np.array([0.3, -0.2, 0.5], np.float32)
    theta = jnp.zeros((1, 48)).at[0, :3].set(jnp.asarray(aa))
    _, j1 = mano.mano_forward(model, theta, beta, cfg)
    rot = R.from_rotvec(aa).as_matrix()
    wrist = np.asarray(j0)[0, 0]
    expect = (np.asarray(j0)[0] - wrist) @ rot.T + wrist
    np.testing.assert_allclose(np.asarray(j1)[0], expect, atol=1e-2)


def test_shape_blendshape_direction(model):
    cfg = ManoConfig(flat_hand_mean=True, center_idx=None)
    theta = jnp.zeros((1, 48))
    beta = jnp.zeros((1, 10)).at[0, 0].set(1.0)
    v0, _ = mano.mano_forward(model, theta, jnp.zeros((1, 10)), cfg)
    v1, _ = mano.mano_forward(model, theta, beta, cfg)
    delta = (np.asarray(v1) - np.asarray(v0))[0] / 1000.0
    np.testing.assert_allclose(delta, np.asarray(model.shapedirs)[..., 0], atol=1e-4)


def test_pca_vs_axis_angle_consistency(model):
    """PCA path with coefficients c equals the AA path fed c @ components."""
    rng = np.random.RandomState(0)
    coeffs = rng.randn(2, 45).astype(np.float32) * 0.3
    root = rng.randn(2, 3).astype(np.float32) * 0.1
    beta = jnp.asarray(rng.randn(2, 10).astype(np.float32) * 0.1)
    theta_pca = jnp.asarray(np.concatenate([root, coeffs], 1))
    aa = coeffs @ np.asarray(model.hands_components)
    theta_aa = jnp.asarray(np.concatenate([root, aa], 1))
    cfg_pca = ManoConfig(use_pca=True, flat_hand_mean=False)
    cfg_aa = ManoConfig(use_pca=False, flat_hand_mean=False)
    v_pca, j_pca = mano.mano_forward(model, theta_pca, beta, cfg_pca)
    v_aa, j_aa = mano.mano_forward(model, theta_aa, beta, cfg_aa)
    np.testing.assert_allclose(np.asarray(v_pca), np.asarray(v_aa), atol=1e-3)
    np.testing.assert_allclose(np.asarray(j_pca), np.asarray(j_aa), atol=1e-3)


def test_center_idx_recentering(model):
    cfg = ManoConfig(center_idx=9)
    theta = jnp.asarray(np.random.RandomState(1).randn(2, 48).astype(np.float32) * 0.2)
    _, joints = mano.mano_forward(model, theta, jnp.zeros((2, 10)), cfg)
    np.testing.assert_allclose(np.asarray(joints)[:, 9], 0.0, atol=1e-3)


def test_decode_skeleton_remap(model):
    theta = jnp.zeros((2, 48))
    beta = jnp.zeros((2, 10))
    out_rhd = mano.mano_decode(model, theta, beta, skeidx="RHD")
    out_fh = mano.mano_decode(model, theta, beta, skeidx="FreiHand")
    np.testing.assert_allclose(
        np.asarray(out_rhd["mano_joints"]),
        np.asarray(out_fh["mano_joints"])[:, skeletons.FREIHAND2RHD],
        atol=1e-6,
    )
    for k in ("mesh", "joints", "mano_joints"):
        assert np.all(np.isfinite(np.asarray(out_rhd[k])))


def test_grads_flow_through_lbs(model):
    def loss(theta, beta):
        verts, joints = mano.mano_forward(model, theta, beta)
        return jnp.sum(verts**2) * 1e-8 + jnp.sum(joints**2) * 1e-8

    g_theta, g_beta = jax.grad(loss, argnums=(0, 1))(
        jnp.ones((1, 48)) * 0.1, jnp.ones((1, 10)) * 0.1
    )
    assert np.all(np.isfinite(np.asarray(g_theta)))
    assert np.all(np.isfinite(np.asarray(g_beta)))
    assert np.abs(np.asarray(g_theta)).max() > 0


def test_folded_keypoints_match_explicit_regression(model):
    """mano_decode's joints come from the regressor folded through the LBS
    (never materialising the mesh); they must equal regressing the returned
    mesh explicitly — including for a NON-row-stochastic J-regressor, where
    centering contributes rowsum * center, not center."""
    scaled = model._replace(
        j_regressor=model.j_regressor
        * (1.0 + 0.3 * jnp.arange(16, dtype=jnp.float32))[:, None]
    )
    key = jax.random.key(3)
    theta = jax.random.normal(key, (4, 48)) * 0.3
    beta = jax.random.normal(jax.random.fold_in(key, 1), (4, 10)) * 0.5
    for m in (model, scaled):
        out = mano.mano_decode(m, theta, beta, skeidx="FreiHand")
        kp_src, tip_ids, tip_verts = skeletons.freihand_gather_indices()
        # Explicit route: regress the (centered, mm) mesh the decode returns.
        expected = np.einsum(
            "jv,bvc->bjc", np.asarray(m.j_regressor), np.asarray(out["mesh"])
        )[:, np.asarray(kp_src)]
        expected[:, np.asarray(tip_ids)] = np.asarray(out["mesh"])[
            :, np.asarray(tip_verts)
        ]
        np.testing.assert_allclose(
            np.asarray(out["joints"]), expected, atol=2e-3
        )
        # Chain tips (mano_joints fingertip slots) = tip vertices of the mesh.
        viz = np.asarray(skeletons.MANOCHAIN2VIZ)
        tip_slots = np.nonzero(viz >= 16)[0]
        np.testing.assert_allclose(
            np.asarray(out["mano_joints"])[:, tip_slots],
            np.asarray(out["mesh"])[:, np.asarray(m.tips)[viz[tip_slots] - 16]],
            atol=2e-3,
        )
