import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from mhentropy_tpu.flows import priors
from mhentropy_tpu.utils.logging import AverageMeter, ScalarWriter


def test_approx_uniform_rect_energy_and_sampling():
    pr = priors.ApproxUniform(-2.0, 2.0, alpha=50.0)
    inside = jnp.zeros((4, 45))
    np.testing.assert_allclose(np.asarray(pr.log_prob(inside)), 0.0)
    outside = jnp.full((1, 45), 3.0)
    # -(50 * relu(3/2 - 1)^2) * 45 = -50 * 0.25 * 45
    np.testing.assert_allclose(
        np.asarray(pr.log_prob(outside)), -50 * 0.25 * 45, rtol=1e-6
    )
    s = pr.sample(jax.random.key(0), (2000, 45))
    sn = np.asarray(s)
    assert sn.min() >= -2.0 and sn.max() <= 2.0
    assert abs(sn.mean()) < 0.1  # uniform over [-2, 2]


def test_approx_uniform_ball_energy_and_sampling():
    pr = priors.ApproxUniform(jnp.zeros(3), math.pi, alpha=5.0, sup="ball")
    inside = jnp.zeros((4, 3))
    np.testing.assert_allclose(np.asarray(pr.log_prob(inside)), 0.0)
    outside = jnp.asarray([[2 * math.pi, 0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(pr.log_prob(outside)), -5.0, rtol=1e-6)
    s = np.asarray(pr.sample(jax.random.key(1), (5000,)))
    r = np.linalg.norm(s, axis=-1)
    assert r.max() <= math.pi + 1e-5
    # The reference's u^0.5 radial law concentrates mass outward; just check
    # support coverage.
    assert r.mean() > math.pi * 0.4


def test_laplace_deadzone_matches_formula():
    x = jnp.asarray([[0.0, 1.0]])
    mu = jnp.asarray([[0.0, 0.0]])
    b = 0.03
    lp = float(priors.laplace_deadzone_log_prob(x, mu, b)[0])
    # term(0) = -(relu(0 - 1e-4) + 1e-4)/b - log(2b) = -1e-4/b - log(2b)
    # term(1) = -(1 - 1e-4 + 1e-4)/b - log(2b)
    expect = (-1e-4 / b - math.log(2 * b)) + (-1.0 / b - math.log(2 * b))
    assert abs(lp - expect) < 1e-4


def test_laplace_vis_masking():
    x = jnp.ones((1, 4))
    mu = jnp.zeros((1, 4))
    w = jnp.asarray([[1.0, 0.0, 2.0, 1.0]])  # only ==1 entries count
    lp = float(priors.laplace_deadzone_log_prob(x, mu, 0.05, weights=w)[0])
    lp_all = float(priors.laplace_deadzone_log_prob(x, mu, 0.05)[0])
    assert lp == lp_all / 2  # two of four terms


def test_log_dist():
    pr = priors.LogDist(loc=1.0, scale=0.5)
    x = jnp.asarray([1.0])
    expect = -math.log(0.5) - 0.5 * math.log(2 * math.pi) - math.log(1.0)
    np.testing.assert_allclose(float(pr.log_prob(x)[0]), expect, rtol=1e-6)


def test_gaussian_kl_zero_at_standard_normal():
    kl = priors.gaussian_kl(jnp.zeros((2, 8)), jnp.ones((2, 8)))
    np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-6)


def test_average_meter_drop_zero_quirk():
    m = AverageMeter(drop_zeros=True)  # the reference's behaviour
    m.update(2.0)
    m.update(0.0)  # silently dropped (utils.py:86-91)
    assert m.avg == 2.0 and m.count == 1
    m2 = AverageMeter(drop_zeros=False)
    m2.update(2.0)
    m2.update(0.0)
    assert m2.avg == 1.0


def test_scalar_writer_jsonl(tmp_path):
    w = ScalarWriter(str(tmp_path))
    w.add_scalar("loss/total", 1.5, global_step=3)
    w.close()
    import json

    lines = open(os.path.join(tmp_path, "scalars.jsonl")).read().splitlines()
    rec = json.loads(lines[-1])
    assert rec["tag"] == "loss/total" and rec["value"] == 1.5 and rec["step"] == 3


def test_encoder_sigma_modes():
    from mhentropy_tpu.models import encoder
    from mhentropy_tpu.models.encoder import EncoderConfig

    for act in ("exp", "sigmoid"):
        cfg = EncoderConfig(backbone="resnet18", n_latent=(8, 8),
                            sigma_act=act, dtype="float32")
        params, stats = encoder.init(jax.random.key(0), cfg, image_size=32)
        img = jnp.zeros((2, 32, 32, 3))
        z, mn, sd, _ = encoder.apply(params, stats, cfg, img,
                                     key=jax.random.key(1))
        assert np.all(np.asarray(sd) > 0)
        if act == "sigmoid":
            assert np.all(np.asarray(sd) < 1)
        # Reparameterised z differs from the mean when a key is given.
        assert not np.allclose(np.asarray(z), np.asarray(mn))
        # Deterministic mode returns the mean.
        z2, mn2, _, _ = encoder.apply(params, stats, cfg, img,
                                      key=jax.random.key(1), deterministic=True)
        np.testing.assert_array_equal(np.asarray(z2), np.asarray(mn2))
