"""int8 fused stem kernel (models/stem_int8.py) — interpret mode.

Reference: the exact quantized arithmetic in XLA — per-channel input
quantize, integer conv (s8 x s8 -> s32), dequant+BN affine, ReLU,
maxpool. The kernel's integer path must match it exactly; the f32
epilogue allows ulp-level association differences only.
"""

import flax.linen as nn
import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
import pytest

from mhentropy_tpu.models import stem_int8


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp)


def _params(key):
    ks = jax.random.split(key, 5)
    kernel = jax.random.normal(ks[0], (7, 7, 3, 64)) * 0.1
    bn_p = {"scale": 1.0 + jax.random.normal(ks[1], (64,)) * 0.2,
            "bias": jax.random.normal(ks[2], (64,)) * 0.1}
    bn_s = {"mean": jax.random.normal(ks[3], (64,)) * 0.1,
            "var": 1.0 + jax.random.uniform(ks[4], (64,)) * 0.5}
    return kernel, bn_p, bn_s


def test_stem_int8_matches_xla_quant_walk():
    """h=64 (W lane-locked to 256) exercises every path incl. padded
    edges at a fraction of the h=256 interpret cost (the stem_pallas
    test's trick)."""
    kernel, bn_p, bn_s = _params(jax.random.key(0))
    image = jax.random.normal(jax.random.key(9), (1, 64, 256, 3)) * 1.5
    amax = jnp.max(jnp.abs(image), axis=(0, 1, 2))
    site = stem_int8.prepare_stem_site(kernel, bn_p, bn_s, amax)

    ours = stem_int8.stem_forward_q(
        image, site, compute_dtype=jnp.float32, out_dtype=jnp.float32)
    ref = stem_int8.xla_reference(image, site)
    assert ours.shape == ref.shape == (1, 16, 64, 64)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_quantization_error_is_bounded_vs_float_stem():
    """End-to-end sanity: the int8 stem approximates the float stem with
    a small relative error (weight + input quantization only — no
    accumulation chain, so the bound is tight)."""
    kernel, bn_p, bn_s = _params(jax.random.key(1))
    image = jax.random.normal(jax.random.key(2), (1, 64, 256, 3)) * 1.2
    amax = jnp.max(jnp.abs(image), axis=(0, 1, 2))
    site = stem_int8.prepare_stem_site(kernel, bn_p, bn_s, amax)

    got = np.asarray(stem_int8.stem_forward_q(
        image, site, compute_dtype=jnp.float32, out_dtype=jnp.float32))

    y = jax.lax.conv_general_dilated(
        image, kernel, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    g = bn_p["scale"] * jax.lax.rsqrt(bn_s["var"] + stem_int8.EPS)
    y = y * g + (bn_p["bias"] - bn_s["mean"] * g)
    ref = np.asarray(nn.max_pool(jnp.maximum(y, 0.0), (3, 3),
                                 strides=(2, 2), padding=[(1, 1), (1, 1)]))
    rel = np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert rel < 0.02, rel
    cos = float((got * ref).sum()
                / (np.linalg.norm(got) * np.linalg.norm(ref) + 1e-9))
    assert cos > 0.999, cos


def test_supported_gates():
    x = jnp.zeros((2, 256, 256, 3))
    # CPU backend -> gated off regardless of geometry.
    assert not stem_int8.supported(x)
