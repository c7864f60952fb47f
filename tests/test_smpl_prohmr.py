import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from mhentropy_tpu.core import smpl as smpl_lib
from mhentropy_tpu.flows.glow import GlowConfig
from mhentropy_tpu.models import prohmr
from mhentropy_tpu.models.encoder import EncoderConfig
from mhentropy_tpu.models.prohmr import ProHMRConfig


@pytest.fixture(scope="module")
def model():
    return smpl_lib.synthetic_smpl_model(0, n_verts=256)


def test_smpl_rest_pose_identity(model):
    b = 2
    rotmats = jnp.tile(jnp.eye(3), (b, 24, 1, 1))
    betas = jnp.zeros((b, 10))
    verts, joints = smpl_lib.smpl_forward(model, rotmats, betas)
    np.testing.assert_allclose(
        np.asarray(verts)[0], np.asarray(model.v_template), atol=1e-5
    )
    rest_j = np.asarray(
        jnp.einsum("jv,vd->jd", model.j_regressor, model.v_template)
    )
    np.testing.assert_allclose(np.asarray(joints)[0], rest_j, atol=1e-5)


def test_smpl_global_rotation_equivariance(model):
    aa = np.array([0.4, -0.1, 0.2], np.float32)
    rot = R.from_rotvec(aa).as_matrix().astype(np.float32)
    pose0 = jnp.tile(jnp.eye(3), (1, 24, 1, 1))
    pose1 = pose0.at[:, 0].set(jnp.asarray(rot))
    betas = jnp.zeros((1, 10))
    _, j0 = smpl_lib.smpl_forward(model, pose0, betas)
    _, j1 = smpl_lib.smpl_forward(model, pose1, betas)
    pelvis = np.asarray(j0)[0, 0]
    expect = (np.asarray(j0)[0] - pelvis) @ rot.T + pelvis
    np.testing.assert_allclose(np.asarray(j1)[0], expect, atol=1e-5)


def test_smpl_child_joint_follows_parent(model):
    """Rotating the left hip must move the left knee/ankle chain but not the
    right leg."""
    aa = np.zeros((1, 72), np.float32)
    aa[0, 3:6] = [1.0, 0.0, 0.0]  # joint 1 = left hip
    _, j0 = smpl_lib.smpl_forward_axis_angle(model, jnp.zeros((1, 72)), jnp.zeros((1, 10)))
    _, j1 = smpl_lib.smpl_forward_axis_angle(model, jnp.asarray(aa), jnp.zeros((1, 10)))
    moved = np.linalg.norm(np.asarray(j1 - j0)[0], axis=1)
    assert moved[4] > 1e-3 and moved[7] > 1e-3  # left knee, ankle
    assert moved[2] < 1e-6 and moved[5] < 1e-6  # right hip/knee untouched


def test_smpl_6d_matches_axis_angle(model):
    rng = np.random.RandomState(0)
    aa = rng.randn(2, 72).astype(np.float32) * 0.2
    rots = R.from_rotvec(aa.reshape(-1, 3)).as_matrix().reshape(2, 24, 3, 3)
    # First two COLUMNS (the reference/ProHMR 6D convention).
    p6d = np.swapaxes(rots, -1, -2)[..., :2, :].reshape(2, 144) \
        .astype(np.float32)
    v_aa, j_aa = smpl_lib.smpl_forward_axis_angle(model, jnp.asarray(aa), jnp.zeros((2, 10)))
    v_6d, j_6d = smpl_lib.smpl_forward_6d(model, jnp.asarray(p6d), jnp.zeros((2, 10)))
    np.testing.assert_allclose(np.asarray(j_aa), np.asarray(j_6d), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_aa), np.asarray(v_6d), atol=1e-4)
    # transl passes through like the rotmat/axis-angle wrappers.
    t = jnp.asarray(rng.randn(2, 3).astype(np.float32))
    v_t, j_t = smpl_lib.smpl_forward_6d(model, jnp.asarray(p6d),
                                        jnp.zeros((2, 10)), transl=t)
    np.testing.assert_allclose(np.asarray(j_t), np.asarray(j_6d + t[:, None]),
                               atol=1e-4)


@pytest.fixture(scope="module")
def prohmr_setup(model):
    cfg = ProHMRConfig(
        encoder=EncoderConfig(backbone="resnet18", n_latent=(64, 64), dtype="float32"),
        flow=GlowConfig(features=prohmr.POSE_DIM, hidden=64, num_layers=2,
                        num_blocks=1, context_features=64),
        image_size=32,
        n_train_hypotheses=2,
    )
    params, stats = prohmr.init(jax.random.key(0), cfg)
    return cfg, params, stats


def test_prohmr_sample_and_metrics(model, prohmr_setup):
    cfg, params, stats = prohmr_setup
    b, n = 2, 4
    image = jnp.zeros((b, 32, 32, 3))
    out = prohmr.sample_hypotheses(
        model, params, stats, cfg, image, jax.random.key(1), n=n
    )
    assert out["pose_6d"].shape == (n, b, 144)
    assert out["joints3d"].shape == (n, b, 24, 3)
    assert out["uv"].shape == (n, b, 24, 2)
    target = {"joints3d": out["joints3d"][0]}
    mets = prohmr.multi_hypothesis_metrics(out, target)
    assert np.all(np.asarray(mets["mpjpe_bh"]) <= np.asarray(mets["mpjpe_mean"]) + 1e-6)
    # Best hypothesis vs its own first sample is ~0.
    assert np.asarray(mets["mpjpe_bh"]).max() < 1e-3


def test_prohmr_sample_quantized_tracks_float(model, prohmr_setup):
    """int8 W8A8 context encoder on the ProHMR path (models/quant.py):
    same hypotheses structure, joints3d close to the float path under the
    same keys (the flow is smooth in the context feature)."""
    from mhentropy_tpu.models import quant

    cfg, params, stats = prohmr_setup
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    ref = prohmr.sample_hypotheses(
        model, params, stats, cfg, image, jax.random.key(1), n=4)
    qarg = quant.quantize_encoder(params["encoder"], stats, cfg.encoder,
                                  image, q_from=1)
    got = prohmr.sample_hypotheses(
        model, params, stats, cfg, image, jax.random.key(1), n=4, quant=qarg)
    assert got["joints3d"].shape == ref["joints3d"].shape
    a, b = np.asarray(ref["joints3d"]), np.asarray(got["joints3d"])
    assert np.isfinite(b).all()
    scale = np.abs(a).mean() + 1e-9
    assert np.abs(a - b).mean() / scale < 0.1, np.abs(a - b).mean() / scale


def test_prohmr_nll_grads(model, prohmr_setup):
    cfg, params, stats = prohmr_setup
    b = 2
    image = jnp.zeros((b, 32, 32, 3))
    target = {
        "pose_6d": jax.random.normal(jax.random.key(2), (b, 144)) * 0.3,
        "betas": jnp.zeros((b, 10)),
        "keypoints3d": jax.random.normal(jax.random.key(4), (b, 24, 3)) * 0.2,
        "keypoints2d": jax.random.normal(jax.random.key(5), (b, 24, 2)) * 0.3,
    }

    def loss(p):
        out, _ = prohmr.nll_loss(
            model, p, stats, cfg, image, target, jax.random.key(3), train=False
        )
        return (-out["log_p"].mean() + out["betas_l2"].mean()
                + out["kp3d_l1"].mean() + out["kp2d_l1"].mean())

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    assert np.abs(np.asarray(grads["flow"][0]["coupling"]["final"]["w"])).max() > 0
    assert np.abs(np.asarray(grads["betas_head"]["w"])).max() > 0
    # The 2D mode-reprojection is the cam head's ONLY gradient path —
    # without it the camera stayed at random init (review regression).
    assert np.abs(np.asarray(grads["cam_head"]["w"])).max() > 0
