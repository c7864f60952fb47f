"""The minimum end-to-end slice (SURVEY.md §7): synthetic batch -> encoder ->
flow hypotheses -> MANO decode -> reprojection loss / BH metrics, all jitted.
"""


import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mhentropy_tpu.core import mano
from mhentropy_tpu.data import synthetic
from mhentropy_tpu.flows.realnvp import RealNVPConfig
from mhentropy_tpu.models import mhent
from mhentropy_tpu.models.encoder import EncoderConfig
from mhentropy_tpu.models.mhent import MHEntConfig
from mhentropy_tpu.train import metrics

IMG = 64
BATCH = 4


@pytest.fixture(scope="module")
def setup():
    cfg = MHEntConfig(
        encoder=EncoderConfig(backbone="resnet18", n_latent=(64, 64), dtype="float32"),
        flow=RealNVPConfig(dim=45, cond_dim=64, h_dim=64, num_steps=2),
        feat_dim=64,
        image_size=IMG,
        n_train_hypotheses=4,
    )
    model = mano.synthetic_mano_model(0)
    params, batch_stats = mhent.init(jax.random.key(0), cfg)
    data = synthetic.make_dataset(model, n=BATCH, image_size=IMG, seed=0)
    image, target = next(synthetic.batches(data, BATCH))
    return cfg, model, params, batch_stats, image, target


def test_reverse_kld_shapes_and_finiteness(setup):
    cfg, model, params, batch_stats, image, target = setup
    out, _ = mhent.reverse_kld(
        model, params, batch_stats, cfg, target, image, jax.random.key(1),
        train=False,
    )
    assert out["log_p"].shape == (BATCH,)
    assert np.all(np.isfinite(np.asarray(out["log_p"])))
    assert "h_q_z_giv_i" in out
    # Entropy of a near-identity flow over 45 dims ~ N(0,I) entropy = 63.9.
    h = np.asarray(out["h_q_z_giv_i"]).mean()
    assert 40.0 < h < 90.0, h


def test_loss_grads_flow_to_all_components(setup):
    cfg, model, params, batch_stats, image, target = setup

    def loss_fn(p):
        out, _ = mhent.reverse_kld(
            model, p, batch_stats, cfg, target, image, jax.random.key(1),
            train=False,
        )
        return -out["log_p"].mean()

    grads = jax.grad(loss_fn)(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # Flow, det head and encoder all receive gradient.
    assert np.abs(np.asarray(grads["flow"].s_w0)).max() > 0
    assert np.abs(np.asarray(grads["det_head"]["l0"]["w"])).max() > 0
    assert (
        np.abs(np.asarray(grads["encoder"]["l1"]["w"])).max() > 0
    ), "conditioning feature got no gradient"


def test_sample_hypotheses_and_metrics(setup):
    cfg, model, params, batch_stats, image, target = setup
    n = 8
    out = mhent.sample_hypotheses(
        model, params, batch_stats, cfg, image, jax.random.key(2), n=n, temp=0.8
    )
    assert out["xyz"].shape == (n, BATCH, 63)
    assert out["uv"].shape == (n, BATCH, 42)
    assert out["verts"].shape == (n, BATCH, 778 * 3)

    out["log_p"] = jnp.zeros(BATCH)
    total, losses, m = metrics.mhent_metrics(dict(out), target)
    for key in (
        "eucLoss_3d_rgb_sample", "eucLoss_2d_rgb_vis", "eucLoss_2d_rgb_invis",
        "eucLoss_3d_rgb_vis_std", "eucLoss_2d_rgb_vis_mean",
    ):
        assert key in m, key
        assert np.all(np.isfinite(np.asarray(m[key]))), key
    # Best-hypothesis error is <= mean-hypothesis error.
    assert np.all(
        np.asarray(m["eucLoss_3d_rgb_vis"])
        <= np.asarray(m["eucLoss_3d_rgb_vis_mean"]) + 1e-6
    )


def test_top_quant_filtering(setup):
    cfg, model, params, batch_stats, image, target = setup
    out = mhent.sample_hypotheses(
        model, params, batch_stats, cfg, image, jax.random.key(3), n=8,
        n_quant=3, temp=0.8,
    )
    assert out["xyz"].shape == (3, BATCH, 63)


def test_oracle_z_achieves_near_zero_error(setup):
    """Feed the GT (theta, beta, st) through decode: BH-MPJPE must be ~0 —
    validates the whole decode/projection/metric chain end to end."""
    cfg, model, params, batch_stats, image, target = setup
    th_bt = jnp.concatenate([target["theta_gt"], target["beta_gt"]], axis=1)
    logs_t = jnp.concatenate(
        [jnp.log(target["st"][:, 0:1]), target["st"][:, 1:3]], axis=1
    )
    dec = mhent.decode(model, cfg, th_bt, logs_t, mods=("uv", "xyz"), inv_norm=True)
    output = {
        "log_p": jnp.zeros(BATCH),
        "xyz": dec["xyz"].reshape(1, BATCH, -1),
        "uv": dec["uv"].reshape(1, BATCH, -1),
    }
    _, _, m = metrics.mhent_metrics(output, target, image_size=IMG)
    # 3D in metres after scale mult; oracle -> < 0.1 mm.
    assert np.asarray(m["eucLoss_3d_rgb_sample"]).max() < 1e-4
    # 2D metric must be ~0 too now that the canvas is parameterised
    # (regression for the round-3 units bug: predictions on an image_size
    # canvas were compared against a hardcoded 256 GT canvas, making every
    # 2D eval metric at non-256 image sizes a frame artifact).
    assert np.asarray(m["eucLoss_2d_rgb_sample"]).max() < 0.1
    uv_gt_px = (np.asarray(target["crop_uv"]) + 1) / 2 * IMG
    uv_pred = np.asarray(dec["uv"]).reshape(BATCH, -1)
    assert np.abs(uv_pred - uv_gt_px).max() < 0.05


def test_kld_weight_annealing():
    cfg = MHEntConfig(kld_w=1.0, kld_w_annealing=(0.0, 100))
    assert float(mhent.kld_weight(cfg, 0)) == 0.0
    assert abs(float(mhent.kld_weight(cfg, 50)) - 0.5) < 1e-6
    assert float(mhent.kld_weight(cfg, 200)) == 1.0


def test_det_regressor_mode(setup):
    _, model, _pu, _bs, image, target = setup
    cfg = MHEntConfig(
        encoder=EncoderConfig(backbone="resnet18", n_latent=(64, 64), dtype="float32"),
        regressor="det",
        feat_dim=64,
        image_size=IMG,
        n_train_hypotheses=2,
        entropy=False,
    )
    params, bs = mhent.init(jax.random.key(5), cfg)
    assert "flow" not in params
    out, _ = mhent.reverse_kld(
        model, params, bs, cfg, target, image, jax.random.key(1), train=False
    )
    assert np.all(np.isfinite(np.asarray(out["log_p"])))


def test_chamfer_loss_option(setup):
    cfg, model, params, batch_stats, image, target = setup
    cfg_ch = cfg._replace(use_chamfer_loss=True, w_chamfer=10.0)
    out, _ = mhent.reverse_kld(
        model, params, batch_stats, cfg_ch, target, image, jax.random.key(1),
        train=False,
    )
    assert "chamfer" in out
    assert np.all(np.isfinite(np.asarray(out["chamfer"])))
    out_plain, _ = mhent.reverse_kld(
        model, params, batch_stats, cfg, target, image, jax.random.key(1),
        train=False,
    )
    assert not np.allclose(np.asarray(out["log_p"]), np.asarray(out_plain["log_p"]))


def test_sample_p_z_and_evidence(setup):
    cfg, model, params, batch_stats, image, target = setup
    z = mhent.sample_p_z(cfg, jax.random.key(7), n=3, b=BATCH)
    assert z.shape == (3 * BATCH, 61)
    zn = np.asarray(z)
    # th45 drawn from the +-2 PCA smooth-uniform support (exact sampler).
    assert zn[:, 3:48].min() >= -2.0 and zn[:, 3:48].max() <= 2.0
    # beta from the +-0.03 box.
    assert np.abs(zn[:, 48:58]).max() <= 0.03
    # th3 from the pi-ball.
    assert np.all(np.linalg.norm(zn[:, :3], axis=1) <= np.pi + 1e-5)

    ev = mhent.evidence_from_target(target, ["bt", "logs", "t"], n=3)
    z2 = mhent.set_evidences(z, ev)
    z2n = np.asarray(z2)
    np.testing.assert_array_equal(z2n[:, 48:58], 0.0)
    st = np.tile(np.asarray(target["st"]), (3, 1))
    np.testing.assert_allclose(z2n[:, 58], np.log(st[:, 0]), rtol=1e-6)
    np.testing.assert_allclose(z2n[:, 59:61], st[:, 1:3], rtol=1e-6)


def test_mask_depth_mods(setup):
    """The reference's dead 'm'/'depth' render mods, functional here."""
    cfg, model, params, batch_stats, image, target = setup
    th_bt = jnp.concatenate([target["theta_gt"], target["beta_gt"]], axis=1)
    logs_t = jnp.concatenate(
        [jnp.log(target["st"][:, 0:1]), target["st"][:, 1:3]], axis=1
    )
    dec = mhent.decode(model, cfg, th_bt, logs_t, mods=("uv", "m", "depth"))
    assert dec["mask"].shape == (BATCH, 64, 64)
    assert dec["depth"].shape == (BATCH, 64, 64)
    assert float(dec["mask"].max()) > 0.5


def test_mask_loss_option(setup):
    cfg, model, params, batch_stats, image, target = setup
    target = dict(target)
    target["hand_mask"] = jnp.ones((BATCH, 64, 64))
    cfg_m = cfg._replace(use_mask_loss=True)
    out, _ = mhent.reverse_kld(
        model, params, batch_stats, cfg_m, target, image, jax.random.key(1),
        train=False,
    )
    assert np.all(np.isfinite(np.asarray(out["log_p"])))
    out_plain, _ = mhent.reverse_kld(
        model, params, batch_stats, cfg, target, image, jax.random.key(1),
        train=False,
    )
    assert not np.allclose(np.asarray(out["log_p"]), np.asarray(out_plain["log_p"]))
