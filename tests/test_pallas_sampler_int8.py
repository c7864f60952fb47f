"""int8 fused sampler correctness (interpret mode on the CPU test
platform): kernel == XLA emulation of the identical quantized math,
exactness degenerate cases, float-path closeness, and the
sample_hypotheses wiring through the quant tuple."""

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
import pytest

from mhentropy_tpu.flows import pallas_sampler_int8 as q8, realnvp
from mhentropy_tpu.flows.realnvp import RealNVPConfig


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp)


def _setup(num_steps=2, cond_dim=32, h_dim=64, b=4, gain=1.0, seed=0):
    cfg = RealNVPConfig(dim=45, cond_dim=cond_dim, h_dim=h_dim,
                        num_steps=num_steps)
    params = realnvp.init_params(jax.random.key(seed), cfg)
    if gain != 1.0:
        # init_params is near-identity (gain 0.01); scale the weights up
        # for a flow with non-trivial couplings.
        params = jax.tree.map(
            lambda v: v * gain if v is not None and v.ndim == 3 else v,
            params)
        params = params._replace(
            masks=jnp.asarray(realnvp.default_masks(cfg.dim, num_steps)))
    feat = jax.random.normal(jax.random.key(seed + 1), (b, cond_dim))
    ftree = q8.quantize_sampler(params, cfg, feat, jax.random.key(seed + 2))
    return cfg, params, feat, ftree


def test_kernel_matches_xla_emulation():
    """The kernel and xla_forward_q run the same quantized arithmetic:
    every intermediate is an f32-exact integer (products <= 127^2, sums
    < 2^24), so they must agree to float rounding."""
    cfg, params, feat, ftree = _setup(gain=20.0)
    n, key = 16, jax.random.key(5)
    x_k, lp_k = q8.sample_fused_q(params, cfg, ftree, key, feat, n,
                                  temp=0.8, return_log_prob=True,
                                  images_per_tile=2, emulate=False)
    x_e, lp_e = q8.sample_fused_q(params, cfg, ftree, key, feat, n,
                                  temp=0.8, return_log_prob=True,
                                  images_per_tile=2, emulate=True)
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_e), atol=2e-5)
    np.testing.assert_allclose(np.asarray(lp_k), np.asarray(lp_e), atol=1e-4)


def test_zero_weight_flow_is_exact_identity():
    """With all coupling weights zero the quantized transform is exactly
    x = z0 (s = t = 0 whatever the quantization scales do), and the
    base draw must match the float paths' (n*b, d) hypothesis-major
    convention from the caller's key."""
    cfg, params, feat, _ = _setup(num_steps=1, h_dim=32)
    params = jax.tree.map(
        lambda v: jnp.zeros_like(v) if v is not None else v, params)
    params = params._replace(
        masks=jnp.asarray(realnvp.default_masks(cfg.dim, 1)))
    ftree = q8.quantize_sampler(params, cfg, feat, jax.random.key(9))
    n, key, temp = 8, jax.random.key(3), 0.7
    x, lp = q8.sample_fused_q(params, cfg, ftree, key, feat, n, temp=temp,
                              return_log_prob=True, images_per_tile=2,
                              emulate=False)
    b = feat.shape[0]
    z0 = jax.random.normal(key, (n * b, cfg.dim)) * temp
    np.testing.assert_allclose(np.asarray(x), np.asarray(z0), atol=1e-6)
    base_lp = -0.5 * np.sum(np.asarray(z0) ** 2, -1) \
        - 0.5 * cfg.dim * np.log(2 * np.pi)
    np.testing.assert_allclose(np.asarray(lp), base_lp, atol=1e-4)


def test_quantized_close_to_float_path():
    """W8A8 samples track the float sampler within a small fraction of
    the sample spread (the PTQ accuracy contract; the production gate
    is the on-chip metric A/B, tools/bench_quant.py)."""
    cfg, params, feat, ftree = _setup(gain=20.0)
    n, key = 16, jax.random.key(11)
    x_q = q8.sample_fused_q(params, cfg, ftree, key, feat, n, temp=0.8,
                            images_per_tile=2, emulate=False)
    cond = realnvp.make_cond(params, cfg, feat)
    cproj = realnvp.cond_cache(params, cfg, cond)
    x_f, _ = realnvp.sample(
        params, cfg, key, n * feat.shape[0],
        cproj=jnp.tile(cproj, (1, 1, n, 1)), temp=0.8, return_log_prob=True,
    )
    err = np.abs(np.asarray(x_q) - np.asarray(x_f))
    spread = np.std(np.asarray(x_f))
    assert err.max() <= 0.1 * spread + 0.02, (err.max(), spread)


def test_pads_batch_and_hypotheses():
    cfg, params, feat, ftree = _setup(num_steps=1, h_dim=32, b=3)
    x = q8.sample_fused_q(params, cfg, ftree, jax.random.key(2), feat, 5,
                          images_per_tile=2, emulate=False)
    assert x.shape == (15, cfg.dim)
    assert np.all(np.isfinite(np.asarray(x)))


def test_sample_hypotheses_int8_sampler_wiring():
    """quant=(spec(int8_sampler), qtree+flow) routes the hypothesis draw
    through the int8 sampler (emulation on CPU) end to end."""
    from mhentropy_tpu.core import mano
    from mhentropy_tpu.data import synthetic
    from mhentropy_tpu.models import mhent, quant
    from mhentropy_tpu.models.encoder import EncoderConfig
    from mhentropy_tpu.models.mhent import MHEntConfig

    img = 32
    cfg = MHEntConfig(
        encoder=EncoderConfig(backbone="resnet18", n_latent=(16, 16),
                              dtype="float32"),
        flow=RealNVPConfig(dim=45, cond_dim=16, h_dim=32, num_steps=1),
        feat_dim=16,
        image_size=img,
    )
    model = mano.synthetic_mano_model(0)
    params, stats = mhent.init(jax.random.key(0), cfg)
    data = synthetic.make_dataset(model, n=2, image_size=img, seed=0)
    image, _ = next(synthetic.batches(data, 2))

    # Encoder stays float (q_from beyond the last stage); only the
    # sampler is quantized.
    spec = quant.QuantSpec(backbone="resnet18", q_from=4, dtype="float32",
                           int8_sampler=True)
    act = quant.calibrate(spec, params["encoder"]["backbone"], stats, image)
    qtree = quant.prepare(spec, params["encoder"]["backbone"], stats, act)
    feat = quant.encoder_feat(spec, qtree, params["encoder"], image)
    qtree["flow"] = q8.quantize_sampler(params["flow"], cfg.flow, feat,
                                        jax.random.key(1), n=4)

    key = jax.random.key(2)
    out_q = mhent.sample_hypotheses(model, params, stats, cfg, image, key,
                                    n=6, temp=0.8, quant=(spec, qtree))
    out_f = mhent.sample_hypotheses(model, params, stats, cfg, image, key,
                                    n=6, temp=0.8)
    assert out_q["xyz"].shape == out_f["xyz"].shape == (6, 2, 63)
    assert np.all(np.isfinite(np.asarray(out_q["xyz"])))
    # Near-identity init flow -> quantization barely perturbs hypotheses.
    np.testing.assert_allclose(np.asarray(out_q["xyz"]),
                               np.asarray(out_f["xyz"]), atol=0.05)


def test_int8_sampler_missing_flow_raises():
    """spec.int8_sampler without a calibrated qtree['flow'] must raise,
    not silently run the float sampler (an int8 A/B would otherwise
    measure bf16-vs-bf16)."""
    from mhentropy_tpu.core import mano
    from mhentropy_tpu.data import synthetic
    from mhentropy_tpu.models import mhent, quant
    from mhentropy_tpu.models.encoder import EncoderConfig
    from mhentropy_tpu.models.mhent import MHEntConfig

    img = 32
    cfg = MHEntConfig(
        encoder=EncoderConfig(backbone="resnet18", n_latent=(16, 16),
                              dtype="float32"),
        flow=RealNVPConfig(dim=45, cond_dim=16, h_dim=32, num_steps=1),
        feat_dim=16, image_size=img,
    )
    model = mano.synthetic_mano_model(0)
    params, stats = mhent.init(jax.random.key(0), cfg)
    data = synthetic.make_dataset(model, n=2, image_size=img, seed=0)
    image, _ = next(synthetic.batches(data, 2))
    spec = quant.QuantSpec(backbone="resnet18", q_from=4, dtype="float32",
                           int8_sampler=True)
    act = quant.calibrate(spec, params["encoder"]["backbone"], stats, image)
    qtree = quant.prepare(spec, params["encoder"]["backbone"], stats, act)
    with pytest.raises(ValueError, match="flow"):
        mhent.sample_hypotheses(model, params, stats, cfg, image,
                                jax.random.key(2), n=4, temp=0.8,
                                quant=(spec, qtree))


def test_kill_switch_forces_emulation(monkeypatch):
    """MHEntConfig.use_pallas_sampler=False must keep the quantized draw
    off the Mosaic kernel: the bit-equivalent XLA emulation runs instead
    (same samples), and the kernel entry point is never invoked."""
    from mhentropy_tpu.core import mano
    from mhentropy_tpu.data import synthetic
    from mhentropy_tpu.models import mhent, quant
    from mhentropy_tpu.models.encoder import EncoderConfig
    from mhentropy_tpu.models.mhent import MHEntConfig

    img = 32
    base = dict(
        encoder=EncoderConfig(backbone="resnet18", n_latent=(16, 16),
                              dtype="float32"),
        flow=RealNVPConfig(dim=45, cond_dim=16, h_dim=32, num_steps=1),
        feat_dim=16, image_size=img,
    )
    cfg_on = MHEntConfig(**base)
    cfg_off = MHEntConfig(**base, use_pallas_sampler=False)
    model = mano.synthetic_mano_model(0)
    params, stats = mhent.init(jax.random.key(0), cfg_on)
    data = synthetic.make_dataset(model, n=2, image_size=img, seed=0)
    image, _ = next(synthetic.batches(data, 2))
    spec = quant.QuantSpec(backbone="resnet18", q_from=4, dtype="float32")
    act = quant.calibrate(spec, params["encoder"]["backbone"], stats, image)
    qtree = quant.prepare(spec, params["encoder"]["backbone"], stats, act)
    spec, qtree = quant.quantize_sampler_into(
        spec, qtree, params, cfg_on.flow, image, temp=0.8)

    key = jax.random.key(2)
    out_on = mhent.sample_hypotheses(model, params, stats, cfg_on, image,
                                     key, n=4, temp=0.8,
                                     quant=(spec, qtree))

    def boom(*a, **k):
        raise AssertionError("kernel path must not run under the kill switch")

    monkeypatch.setattr(q8, "_fused_transform_q", boom)
    out_off = mhent.sample_hypotheses(model, params, stats, cfg_off, image,
                                      key, n=4, temp=0.8,
                                      quant=(spec, qtree))
    # Same quantized arithmetic either way (kernel == emulation).
    np.testing.assert_allclose(np.asarray(out_off["xyz"]),
                               np.asarray(out_on["xyz"]), atol=2e-5)


def test_sampler_supported_gates():
    from mhentropy_tpu.models import quant
    from mhentropy_tpu.models.encoder import EncoderConfig
    from mhentropy_tpu.models.mhent import MHEntConfig

    base = dict(
        encoder=EncoderConfig(backbone="resnet18", n_latent=(16, 16)),
        flow=RealNVPConfig(dim=45, cond_dim=16, h_dim=32, num_steps=1),
        feat_dim=16, image_size=32,
    )
    assert quant.sampler_supported(MHEntConfig(**base))
    assert not quant.sampler_supported(
        MHEntConfig(**base, use_pallas_sampler=False))
    assert not quant.sampler_supported(
        MHEntConfig(**base, regressor="det"))
    wide = dict(base, flow=RealNVPConfig(dim=200, cond_dim=16, h_dim=32,
                                         num_steps=1))
    assert not quant.sampler_supported(MHEntConfig(**wide))
