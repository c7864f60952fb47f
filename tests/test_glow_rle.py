import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mhentropy_tpu.flows import glow
from mhentropy_tpu.flows.glow import GlowConfig


@pytest.fixture(scope="module")
def glow_setup():
    cfg = GlowConfig(features=12, hidden=32, num_layers=2, num_blocks=2,
                     context_features=16)
    params = glow.init_params(jax.random.key(0), cfg)
    ctx = jax.random.normal(jax.random.key(1), (5, 16))
    return cfg, params, ctx


def test_glow_forward_inverse_roundtrip(glow_setup):
    cfg, params, ctx = glow_setup
    x = jax.random.normal(jax.random.key(2), (5, cfg.features))
    ctx_proj = glow._ctx_cache(params, ctx)
    z, ld_inv = glow.inverse(params, cfg, x, ctx_proj)
    x2, ld_fwd = glow.forward(params, cfg, z, ctx_proj)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld_fwd), -np.asarray(ld_inv), atol=1e-4)


def test_glow_logdet_matches_autodiff(glow_setup):
    cfg, params, ctx = glow_setup
    x = jax.random.normal(jax.random.key(3), (2, cfg.features))

    _, logdet = glow.inverse(params, cfg, x, glow._ctx_cache(params, ctx[:2]))
    for i in range(2):
        cache_i = glow._ctx_cache(params, ctx[i : i + 1])

        def inv_one(xi):
            z, _ = glow.inverse(params, cfg, xi[None], cache_i)
            return z[0]

        jac = jax.jacobian(inv_one)(x[i])
        _, ref = np.linalg.slogdet(np.asarray(jac))
        np.testing.assert_allclose(np.asarray(logdet)[i], ref, atol=1e-3)


def test_glow_sample_and_log_prob_consistency(glow_setup):
    cfg, params, ctx = glow_setup
    n = 3
    x, lp = glow.sample_and_log_prob(params, ctx, jax.random.key(4), n, temp=0.9,
                                     cfg=cfg)
    assert x.shape == (n * 5, cfg.features)
    ctx_rows = jnp.tile(ctx, (n, 1))
    lp_inv = glow.log_prob(params, x, ctx_rows, cfg=cfg)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_inv), atol=1e-3)


def test_glow_train_mode_requires_explicit_cfg(glow_setup):
    """infer_config cannot recover dropout from params, so a train-mode
    call without cfg would silently skip coupling-net dropout — refuse it
    (the 'configured but never applied' defect class)."""
    cfg, params, ctx = glow_setup
    x = jax.random.normal(jax.random.key(6), (5, cfg.features))
    with pytest.raises(ValueError, match="GlowConfig"):
        glow.log_prob(params, x, ctx, train=True, key=jax.random.key(0))
    with pytest.raises(ValueError, match="GlowConfig"):
        glow.sample_and_log_prob(params, ctx, jax.random.key(0), 2,
                                 train=True)
    # With an explicit cfg the train path still runs.
    lp = glow.log_prob(params, x, ctx, cfg=cfg, train=True,
                       key=jax.random.key(0))
    assert np.all(np.isfinite(np.asarray(lp)))


def test_glow_context_changes_density(glow_setup):
    cfg, params, ctx = glow_setup
    x = jax.random.normal(jax.random.key(5), (5, cfg.features))
    lp1 = glow.log_prob(params, x, ctx, cfg=cfg)
    lp2 = glow.log_prob(params, x, ctx * 3.0, cfg=cfg)
    assert not np.allclose(np.asarray(lp1), np.asarray(lp2))


# ----------------------------------------------------------------- RLE mode


def test_rle_loss_and_predict():
    from mhentropy_tpu.data import synthetic
    from mhentropy_tpu.core import mano
    from mhentropy_tpu.flows.realnvp import RealNVPConfig
    from mhentropy_tpu.models import rle
    from mhentropy_tpu.models.encoder import EncoderConfig

    img = 32
    cfg = rle.RLEConfig(
        encoder=EncoderConfig(backbone="resnet18", n_latent=(63, 63), dtype="float32"),
        flow=RealNVPConfig(dim=3, tsfm_on="x", h_dim=16, num_steps=1, joint_n=21),
        pe="3d",
        k1=3,
        image_size=img,
        nf_res="rle",
    )
    params, stats = rle.init(jax.random.key(0), cfg)
    model = mano.synthetic_mano_model(0)
    data = synthetic.make_dataset(model, n=4, image_size=img, seed=0)
    image, target = next(synthetic.batches(data, 4))
    out, _ = rle.loss_and_predict(params, stats, cfg, image, target, jax.random.key(1))
    assert out["log_p"].shape == (4,)
    assert np.all(np.isfinite(np.asarray(out["log_p"])))
    assert out["pose_rgb_sample"].shape == (4, 63)
    assert out["xyz"].shape == (3, 4, 63)
    assert "log_q" in out and np.all(np.isfinite(np.asarray(out["log_q"])))
    assert float(out["sigma_i"]) > 0

    def loss_fn(p):
        o, _ = rle.loss_and_predict(p, stats, cfg, image, target, jax.random.key(1))
        return -o["log_p"].mean()

    grads = jax.grad(loss_fn)(params)
    assert np.abs(np.asarray(grads["p_nf"].s_w0)).max() > 0
    assert np.abs(np.asarray(grads["encoder"]["l1"]["w"])).max() > 0


def test_mhent_glow_regressor_mode():
    """MHEnt with the ConditionalGlow posterior (network.py:342-344)."""
    from mhentropy_tpu.core import mano
    from mhentropy_tpu.data import synthetic
    from mhentropy_tpu.models import mhent
    from mhentropy_tpu.models.encoder import EncoderConfig
    from mhentropy_tpu.models.mhent import MHEntConfig

    img = 32
    cfg = MHEntConfig(
        encoder=EncoderConfig(backbone="resnet18", n_latent=(32, 32), dtype="float32"),
        regressor="glow",
        feat_dim=32,
        image_size=img,
        n_train_hypotheses=2,
    )
    params, stats = mhent.init(jax.random.key(0), cfg)
    assert "actnorm" in params["flow"][0]  # fork-exact per-step param dicts
    model = mano.synthetic_mano_model(0)
    data = synthetic.make_dataset(model, n=2, image_size=img, seed=0)
    image, target = next(synthetic.batches(data, 2))
    out, _ = mhent.reverse_kld(
        model, params, stats, cfg, target, image, jax.random.key(1), train=False
    )
    assert np.all(np.isfinite(np.asarray(out["log_p"])))
    samples = mhent.sample_hypotheses(
        model, params, stats, cfg, image, jax.random.key(2), n=4, temp=0.8
    )
    assert samples["xyz"].shape == (4, 2, 63)


def test_rle_h36m_uvd_branch():
    from mhentropy_tpu.models import rle

    rng = np.random.RandomState(0)
    k1, b = 3, 2
    samples = jnp.asarray(rng.randn(k1, b, 51).astype(np.float32) * 0.1)
    target = {
        "pose3d": samples[1],  # sample 1 is exactly GT -> BH must pick it
        "pose3d_root": jnp.asarray(rng.uniform(2, 4, (b, 3)).astype(np.float32)),
        "st_cam": jnp.asarray(
            np.tile(np.array([500.0, 500.0, 128.0, 128.0], np.float32), (b, 1))
        ),
    }
    uvd = rle.best_hypothesis_uvd(samples, target)
    assert uvd.shape == (b, 51)
    assert np.all(np.isfinite(np.asarray(uvd)))
    # depth channel = rel z / 2 of the chosen (GT) hypothesis.
    np.testing.assert_allclose(
        np.asarray(uvd).reshape(b, -1, 3)[..., 2],
        np.asarray(samples[1]).reshape(b, -1, 3)[..., 2] / 2.0,
        atol=1e-6,
    )


def test_rle_train_step_sharding_matches_single_device():
    """The RLE data-parallel step must compute the same update as 1 device
    (multichip correctness for the second model family, cf. the MHEnt
    equivalent in test_engine.py)."""
    from mhentropy_tpu.core import mano
    from mhentropy_tpu.data import synthetic
    from mhentropy_tpu.flows.realnvp import RealNVPConfig
    from mhentropy_tpu.models import rle
    from mhentropy_tpu.models.encoder import EncoderConfig
    from mhentropy_tpu.parallel import mesh as mesh_lib
    from mhentropy_tpu.train import engine

    img = 32
    cfg = rle.RLEConfig(
        encoder=EncoderConfig(backbone="resnet18", n_latent=(63, 63), dtype="float32"),
        flow=RealNVPConfig(dim=3, tsfm_on="x", h_dim=16, num_steps=1, joint_n=21),
        pe="3d",
        k1=3,
        image_size=img,
        nf_res="rle",
    )
    model = mano.synthetic_mano_model(0)
    data = synthetic.make_dataset(model, n=8, image_size=img, seed=3)
    image, target = next(synthetic.batches(data, 8))
    optimizer = engine.make_optimizer(1e-3, [100], steps_per_epoch=10)

    results = {}
    for ndev in (1, 8):
        mesh = mesh_lib.make_mesh(n_devices=ndev, hypo=1)
        params, stats = rle.init(jax.random.key(0), cfg)
        state = engine.TrainState(params, stats, optimizer.init(params), 0)
        im = mesh_lib.shard_batch(mesh, image)
        tg = mesh_lib.shard_batch(mesh, target)
        step = engine.make_rle_train_step(cfg, optimizer, mesh)
        state, aux = step(state, im, tg, jax.random.key(7))
        results[ndev] = (
            float(aux["loss"]),
            np.asarray(state.params["encoder"]["l1"]["w"]),
        )
    assert abs(results[1][0] - results[8][0]) / abs(results[1][0]) < 1e-4
    # Adam's per-param normalisation amplifies cross-shard reduction-order
    # noise on near-zero grads; a real sharding bug shows O(1) diffs.
    np.testing.assert_allclose(results[1][1], results[8][1], atol=1e-3)
