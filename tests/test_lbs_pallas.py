"""Fused LBS blend kernel ≡ the XLA einsum path (interpret mode)."""

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
import pytest

from mhentropy_tpu.core import lbs_pallas, mano


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp)


@pytest.mark.parametrize("v,j,rows", [
    (778, 16, 100),    # MANO; rows < tile exercises the R-padding path
    (1500, 24, 100),   # SMPL joints; V > v_tile exercises vertex tiling
])
def test_blend_matches_einsum_path(v, j, rows):
    rng = np.random.RandomState(0)
    w = jnp.asarray(np.abs(rng.randn(v, j)).astype(np.float32))
    chain_r = jnp.asarray(rng.randn(3, 3, j, rows).astype(np.float32))
    skin_t = jnp.asarray(rng.randn(3, j, rows).astype(np.float32))
    vp = jnp.asarray(rng.randn(3, v, rows).astype(np.float32))

    got = lbs_pallas.lbs_blend(w, chain_r, skin_t, vp, tile=128)

    pvr = jnp.einsum("vj,rcjb->rcvb", w, chain_r)
    pvt = jnp.einsum("vj,rjb->rvb", w, skin_t)
    want = jnp.einsum("rcvb,cvb->rvb", pvr, vp) + pvt

    assert got.shape == want.shape == (3, v, rows)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_mano_forward_pallas_lbs_matches_xla():
    """Full _mano_forward_nl with the kernel ≡ the einsum path."""
    model = mano.synthetic_mano_model(0)
    rng = np.random.RandomState(1)
    theta = jnp.asarray(rng.randn(4, 48).astype(np.float32) * 0.3)
    beta = jnp.asarray(rng.randn(4, 10).astype(np.float32) * 0.5)

    v_x, j_x = mano._mano_forward_nl(model, theta, beta)
    v_p, j_p = mano._mano_forward_nl(model, theta, beta, pallas_lbs=True)
    np.testing.assert_allclose(np.asarray(j_p), np.asarray(j_x),
                               rtol=1e-5, atol=1e-4)  # mm scale
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_x),
                               rtol=1e-5, atol=1e-4)
