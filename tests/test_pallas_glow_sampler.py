"""Fused glow sampler correctness vs the XLA glow path (interpret mode on
the CPU test platform; the same kernel compiles on TPU — the full-pipeline
A/B at ProHMR shapes is recorded in docs/PERF.md)."""

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
import pytest

from mhentropy_tpu.flows import glow, pallas_glow_sampler as pgs
from mhentropy_tpu.flows.glow import GlowConfig


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp)


def _setup(features=45, hidden=64, num_layers=4, context=32, seed=0):
    cfg = GlowConfig(features=features, hidden=hidden, num_layers=num_layers,
                     num_blocks=2, context_features=context)
    params = glow.init_params(jax.random.key(seed), cfg)
    # Non-degenerate actnorm/LU so every op is exercised.
    k = jax.random.key(seed + 1)
    for layer in params:
        k, k1, k2, k3, k4 = jax.random.split(k, 5)
        d = cfg.features
        layer["actnorm"] = {
            "log_scale": jax.random.normal(k1, (d,)) * 0.2,
            "shift": jax.random.normal(k2, (d,)) * 0.3,
        }
        n_tri = (d - 1) * d // 2
        layer["linear"]["lower_entries"] = (
            jax.random.normal(k3, (n_tri,)) * 0.3 / np.sqrt(d)
        )
        layer["linear"]["upper_entries"] = (
            jax.random.normal(k4, (n_tri,)) * 0.3 / np.sqrt(d)
        )
    return cfg, params


def test_fused_matches_xla_glow_shared_noise():
    """Same base noise through kernel and XLA path -> identical samples and
    log densities (f32 weights; bit-level path differences only)."""
    cfg, params = _setup()
    b, n = 4, 16
    feat = jax.random.normal(jax.random.key(7), (b, cfg.context_features))
    noise = jax.random.normal(jax.random.key(8), (n * b, cfg.features)) * 0.8

    x_ref, lp_ref = glow.sample_and_log_prob(
        params, feat, jax.random.key(9), n, cfg=cfg, noise=noise
    )
    x_f, lp_f = pgs.sample_and_log_prob_fused(
        params, feat, jax.random.key(9), n, cfg=cfg, noise=noise,
        images_per_tile=2, weight_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lp_f), np.asarray(lp_ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_pads_batch_and_hypotheses():
    """b and n not aligned to tile sizes -> padded internally, exact values
    preserved."""
    cfg, params = _setup(features=12, hidden=32, num_layers=2, context=8)
    b, n = 3, 5
    feat = jax.random.normal(jax.random.key(3), (b, cfg.context_features))
    noise = jax.random.normal(jax.random.key(4), (n * b, cfg.features))
    x_ref, lp_ref = glow.sample_and_log_prob(
        params, feat, jax.random.key(5), n, cfg=cfg, noise=noise
    )
    x_f, lp_f = pgs.sample_and_log_prob_fused(
        params, feat, jax.random.key(5), n, cfg=cfg, noise=noise,
        images_per_tile=2, weight_dtype=jnp.float32,
    )
    assert x_f.shape == (n * b, cfg.features)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lp_f), np.asarray(lp_ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_own_noise_statistics():
    """Without shared noise the fused sampler must still produce the right
    distribution family: finite samples, log_prob consistent with the XLA
    evaluation of those samples."""
    cfg, params = _setup(features=12, hidden=32, num_layers=2, context=8)
    b, n = 2, 64
    feat = jax.random.normal(jax.random.key(11), (b, cfg.context_features))
    x, lp = pgs.sample_and_log_prob_fused(
        params, feat, jax.random.key(12), n, temp=1.0, cfg=cfg,
        weight_dtype=jnp.float32,
    )
    assert np.isfinite(np.asarray(x)).all()
    # log q(x) recomputed by the XLA inverse pass must agree.
    ctx_rows = jnp.tile(feat, (n, 1))
    lp_ref = glow.log_prob(params, x, ctx_rows, cfg=cfg)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_ref),
                               rtol=1e-3, atol=1e-3)


def test_mhent_glow_regressor_uses_fused_sampler():
    """MHEnt's glow-regressor inference path routes through the fused
    sampler when forced; z layout and flow log-density stay consistent with
    an XLA re-evaluation of the produced samples."""
    from mhentropy_tpu.models import mhent as mhent_lib
    from mhentropy_tpu.models.mhent import MHEntConfig

    cfg = MHEntConfig(regressor="glow", feat_dim=16, use_pallas_sampler=True)
    d_out = cfg.det_dims()
    params = {
        "flow": glow.init_params(
            jax.random.key(0),
            GlowConfig(features=45, hidden=32, num_layers=2, num_blocks=2,
                       context_features=16),
        ),
        "det_head": {
            "l0": {"w": jax.random.normal(jax.random.key(1), (16, 16)) * 0.1,
                   "b": jnp.zeros(16)},
            "l1": {"w": jax.random.normal(jax.random.key(4), (16, d_out)) * 0.1,
                   "b": jnp.zeros(d_out)},
        },
    }
    feat = jax.random.normal(jax.random.key(2), (3, 16))
    z, log_q = mhent_lib.sample_q_z(params, cfg, feat, jax.random.key(3),
                                    n=4, temp=0.9, differentiable=False)
    assert z.shape == (12, 61)
    ctx_rows = jnp.tile(feat, (4, 1))
    lp_ref = glow.log_prob(params["flow"], z[:, 3:48], ctx_rows)
    np.testing.assert_allclose(np.asarray(log_q), np.asarray(lp_ref),
                               rtol=1e-3, atol=1e-3)


def test_fused_own_noise_matches_xla_same_key():
    """noise=None draws exactly like glow.sample_and_log_prob (split +
    hypothesis-major (n*b, d)): toggling the fused sampler never changes
    a seeded run's samples."""
    cfg, params = _setup(features=12, hidden=32, num_layers=2, context=8)
    b, n = 3, 8
    feat = jax.random.normal(jax.random.key(70), (b, 8))
    x_ref, lp_ref = glow.sample_and_log_prob(
        params, feat, jax.random.key(77), n, temp=0.9, cfg=cfg)
    x_f, lp_f = pgs.sample_and_log_prob_fused(
        params, feat, jax.random.key(77), n, temp=0.9, cfg=cfg,
        weight_dtype=jnp.float32)  # isolate the draw; bf16 is perf-only
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(lp_f), np.asarray(lp_ref),
                               atol=2e-3)
