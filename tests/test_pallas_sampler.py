"""Fused Pallas sampler correctness vs the XLA scan path (interpret mode on
the CPU test platform; the same kernel compiles on TPU — see bench.py)."""


import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
import pytest

from mhentropy_tpu.flows import pallas_sampler as ps, realnvp
from mhentropy_tpu.flows.realnvp import RealNVPConfig


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp)


def test_fused_matches_xla_forward():
    cfg = RealNVPConfig(dim=45, cond_dim=32, h_dim=64, num_steps=2)
    params = realnvp.init_params(jax.random.key(0), cfg)
    b, n = 4, 16
    feat = jax.random.normal(jax.random.key(1), (b, 32))
    key = jax.random.key(2)

    x_fused, lp_fused = ps.sample_fused(
        params, cfg, key, feat, n, temp=0.8, return_log_prob=True,
        images_per_tile=2,
    )

    # The XLA path with the SAME key must give the same hypotheses:
    # sample_fused draws exactly like realnvp.sample (hypothesis-major
    # (n*b, d) from the caller's key), so toggling use_pallas_sampler
    # never changes a seeded run's samples.
    cond = realnvp.make_cond(params, cfg, feat)
    cproj = realnvp.cond_cache(params, cfg, cond)
    x_ref, lp_ref = realnvp.sample(
        params, cfg, key, n * b, cproj=jnp.tile(cproj, (1, 1, n, 1)),
        temp=0.8, return_log_prob=True,
    )
    np.testing.assert_allclose(np.asarray(x_fused), np.asarray(x_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(lp_fused), np.asarray(lp_ref), atol=1e-4)


def test_fused_pads_batch_and_hypotheses():
    cfg = RealNVPConfig(dim=45, cond_dim=16, h_dim=32, num_steps=1)
    params = realnvp.init_params(jax.random.key(0), cfg)
    b, n = 3, 5  # neither aligned
    feat = jax.random.normal(jax.random.key(1), (b, 16))
    x = ps.sample_fused(params, cfg, jax.random.key(2), feat, n,
                        images_per_tile=2)
    assert x.shape == (n * b, cfg.dim)
    assert np.all(np.isfinite(np.asarray(x)))


def test_diff_wrapper_forward_matches_and_grads_match_xla():
    """transform_diff: kernel forward == XLA forward; gradients == XLA
    gradients (the custom-VJP recompute path)."""
    cfg = RealNVPConfig(dim=45, cond_dim=16, h_dim=32, num_steps=1)
    params = realnvp.init_params(jax.random.key(0), cfg)
    b, n = 2, 8
    feat = jax.random.normal(jax.random.key(1), (b, 16))
    cond = realnvp.make_cond(params, cfg, feat)
    cproj = realnvp.cond_cache(params, cfg, cond)
    z0 = jax.random.normal(jax.random.key(2), (b, n, cfg.dim))

    x_k, ld_k = ps.transform_diff(params, cfg, z0, cproj, 2)
    x_x, ld_x = ps._xla_equivalent(params, cfg, z0, cproj)
    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ld_k), np.asarray(ld_x), atol=1e-4)

    def loss_kernel(p):
        x, ld = ps.transform_diff(p, cfg, z0, cproj, 2)
        return (x**2).sum() + ld.sum()

    def loss_xla(p):
        x, ld = ps._xla_equivalent(p, cfg, z0, cproj)
        return (x**2).sum() + ld.sum()

    g_k = jax.grad(loss_kernel)(params)
    g_x = jax.grad(loss_xla)(params)
    np.testing.assert_allclose(
        np.asarray(g_k.s_w0), np.asarray(g_x.s_w0), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(g_k.t_b2), np.asarray(g_x.t_b2), rtol=2e-3, atol=2e-4
    )


def test_diff_sample_consistency():
    cfg = RealNVPConfig(dim=45, cond_dim=16, h_dim=32, num_steps=1)
    params = realnvp.init_params(jax.random.key(0), cfg)
    feat = jax.random.normal(jax.random.key(1), (3, 16))
    x, lp = ps.sample_fused_diff(params, cfg, jax.random.key(2), feat, n=5,
                                 images_per_tile=2)
    assert x.shape == (15, 45) and lp.shape == (15,)
    cond = realnvp.make_cond(params, cfg, feat)
    cproj = realnvp.cond_cache(params, cfg, cond)
    lp_inv = realnvp.log_prob(params, cfg, x, cproj=jnp.tile(cproj, (1, 1, 5, 1)))
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_inv), atol=1e-4)


def test_diff_sampler_draws_like_xla_path():
    """sample_fused_diff must draw base noise exactly like realnvp.sample
    ((n*b, d) hypothesis-major from the caller's key), so forcing the
    kernel for TRAINING never changes a seeded run's hypotheses — the
    same invariant test_fused_matches_xla_forward pins for inference."""
    cfg = RealNVPConfig(dim=45, cond_dim=16, h_dim=32, num_steps=1)
    params = realnvp.init_params(jax.random.key(0), cfg)
    b, n = 4, 8
    feat = jax.random.normal(jax.random.key(1), (b, 16))
    key = jax.random.key(7)
    x, lp = ps.sample_fused_diff(params, cfg, key, feat, n=n, temp=1.0,
                                 images_per_tile=2)
    cond = realnvp.make_cond(params, cfg, feat)
    cproj = realnvp.cond_cache(params, cfg, cond)
    x_ref, lp_ref = realnvp.sample(
        params, cfg, key, n * b, cproj=jnp.tile(cproj, (1, 1, n, 1)),
        temp=1.0, return_log_prob=True,
    )
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_ref), atol=1e-4)


def test_forced_kernel_train_step_under_grad():
    """use_pallas_sampler=True routes training sampling through
    sample_fused_diff (kernel fwd, XLA-remat bwd) and gradients flow
    (VERDICT r1 item 7 dispatch wiring)."""
    from mhentropy_tpu.core import mano
    from mhentropy_tpu.data import synthetic
    from mhentropy_tpu.models import mhent
    from mhentropy_tpu.models.encoder import EncoderConfig
    from mhentropy_tpu.models.mhent import MHEntConfig

    img = 32
    cfg = MHEntConfig(
        encoder=EncoderConfig(backbone="resnet18", n_latent=(16, 16),
                              dtype="float32"),
        flow=RealNVPConfig(dim=45, cond_dim=16, h_dim=32, num_steps=1),
        feat_dim=16,
        image_size=img,
        n_train_hypotheses=2,
        use_pallas_sampler=True,  # force the kernel even under grad
    )
    model = mano.synthetic_mano_model(0)
    params, stats = mhent.init(jax.random.key(0), cfg)
    data = synthetic.make_dataset(model, n=2, image_size=img, seed=0)
    image, target = next(synthetic.batches(data, 2))

    def loss_fn(p):
        out, _ = mhent.reverse_kld(
            model, p, stats, cfg, target, image, jax.random.key(1), train=False
        )
        return -out["log_p"].mean()

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    assert np.abs(np.asarray(grads["flow"].s_w0)).max() > 0
    assert np.abs(np.asarray(grads["encoder"]["l1"]["w"])).max() > 0


def test_default_temps_agree_across_sampler_paths():
    """The 'same key -> same samples' contract must hold for callers that
    rely on DEFAULTS too: sample_fused / sample_fused_diff default temp
    now matches realnvp.sample's 0.7 (they drifted 0.8/1.0/0.7 before —
    toggling the kernel path changed a seeded run's hypotheses)."""
    import inspect

    ref = inspect.signature(realnvp.sample).parameters["temp"].default
    for fn in (ps.sample_fused, ps.sample_fused_diff):
        got = inspect.signature(fn).parameters["temp"].default
        assert got == ref, (fn.__name__, got, ref)
    from mhentropy_tpu.flows import pallas_sampler_int8 as q8

    got = inspect.signature(q8.sample_fused_q).parameters["temp"].default
    assert got == ref


def test_fused_sampler_refuses_per_joint_dims():
    """dim in {2,3} => make_cond emits B*joint_n cond rows, incompatible
    with the kernel's B-row tile layout — must raise loudly, and the int8
    shape gates must exclude it."""
    cfg = RealNVPConfig(dim=3, cond_dim=16, h_dim=32, num_steps=1,
                        joint_n=21)
    params = realnvp.init_params(jax.random.key(0), cfg)
    feat = jax.random.normal(jax.random.key(1), (2, 16))
    with pytest.raises(NotImplementedError):
        ps.sample_fused(params, cfg, jax.random.key(2), feat, 4)
    with pytest.raises(NotImplementedError):
        ps.sample_fused_diff(params, cfg, jax.random.key(2), feat, 4)
    from mhentropy_tpu.flows import pallas_sampler_int8 as q8

    assert not q8.supported(cfg)
