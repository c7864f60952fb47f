"""GPipe flow-stack pipeline (parallel/pipeline.py) vs the sequential scan.

8 virtual CPU devices; mesh (data=2, pipe=4). The pipelined inverse must be
bit-identical in forward (same dots in the same order, only the schedule
differs) and match gradients through the ppermute chain.
"""

import jax
import jax.numpy as jnp
import pytest

from mhentropy_tpu.flows import realnvp
from mhentropy_tpu.parallel import mesh as mesh_lib, pipeline


@pytest.fixture(scope="module")
def setup():
    cfg = realnvp.RealNVPConfig(dim=45, cond_dim=32, h_dim=32, num_steps=2)
    params = realnvp.init_params(jax.random.key(0), cfg)
    mesh = mesh_lib.make_mesh(n_devices=8, pp=4)
    x = jax.random.normal(jax.random.key(1), (8, 45))
    feat = jax.random.normal(jax.random.key(2), (8, 32))
    cond = realnvp.make_cond(params, cfg, feat)
    cproj = realnvp.cond_cache(params, cfg, cond)
    return cfg, params, mesh, x, feat, cproj


def test_pipelined_inverse_matches_sequential(setup):
    cfg, params, mesh, x, feat, cproj = setup
    z0, ld0 = realnvp.inverse(params, cfg, x, cproj)
    with mesh:
        z1, ld1 = jax.jit(
            lambda p, xx, c: pipeline.inverse_pipelined(p, cfg, xx, c, mesh, 2)
        )(params, x, cproj)
    assert float(jnp.max(jnp.abs(z1 - z0))) == 0.0
    assert float(jnp.max(jnp.abs(ld1 - ld0))) == 0.0

    lp0 = realnvp.log_prob(params, cfg, x, feat=feat)
    with mesh:
        lp1 = pipeline.log_prob_pipelined(params, cfg, x, feat, mesh, 2)
    assert float(jnp.max(jnp.abs(lp1 - lp0))) < 1e-6


def test_pipelined_gradients_match_sequential(setup):
    """jax.grad through scan+ppermute = the reverse pipeline schedule;
    parameter gradients must agree with the plain scan to float noise."""
    cfg, params, mesh, x, feat, cproj = setup

    def loss_seq(p):
        z, ld = realnvp.inverse(p, cfg, x, cproj)
        return jnp.sum(z**2) + jnp.sum(ld**2)

    def loss_pipe(p):
        z, ld = pipeline.inverse_pipelined(p, cfg, x, cproj, mesh, 2)
        return jnp.sum(z**2) + jnp.sum(ld**2)

    g0 = jax.grad(loss_seq)(params)
    with mesh:
        g1 = jax.jit(jax.grad(loss_pipe))(params)
    errs = jax.tree_util.tree_map(
        lambda a, b: float(
            jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9)
        ),
        g0, g1,
    )
    assert max(jax.tree_util.tree_leaves(errs)) < 1e-5


def test_pipelined_forward_and_sample_match_sequential(setup):
    """The sampling direction (base -> data, the TRAIN-step draw): the
    pipelined forward runs the same dots in the same order — only XLA's
    fusion choices differ between the jitted schedule and the op-by-op
    reference (measured ~5e-7 abs on O(1) values), and sample_pipelined at
    the same key draws the identical base noise."""
    cfg, params, mesh, x, feat, cproj = setup
    x0, ld0 = realnvp.forward(params, cfg, x, cproj)
    with mesh:
        x1, ld1 = jax.jit(
            lambda p, xx, c: pipeline.forward_pipelined(p, cfg, xx, c, mesh, 2)
        )(params, x, cproj)
    assert float(jnp.max(jnp.abs(x1 - x0))) < 1e-6
    assert float(jnp.max(jnp.abs(ld1 - ld0))) < 1e-6

    key = jax.random.key(5)
    s0, lp0 = realnvp.sample(
        params, cfg, key, 8, feat=feat, temp=0.8, return_log_prob=True)
    with mesh:
        s1, lp1 = pipeline.sample_pipelined(
            params, cfg, key, 8, feat, mesh, 2, temp=0.8,
            return_log_prob=True)
    assert float(jnp.max(jnp.abs(s1 - s0))) < 1e-6
    assert float(jnp.max(jnp.abs(lp1 - lp0))) < 1e-6


def test_pipelined_sample_gradients_match_sequential(setup):
    """reverse_kld differentiates through the draw: grads of the pipelined
    sampling schedule must match the sequential scan."""
    cfg, params, mesh, x, feat, cproj = setup
    key = jax.random.key(6)

    def loss_seq(p):
        s, lp = realnvp.sample(
            p, cfg, key, 8, feat=feat, temp=1.0, return_log_prob=True)
        return jnp.sum(s**2) + jnp.sum(lp**2)

    def loss_pipe(p):
        s, lp = pipeline.sample_pipelined(
            p, cfg, key, 8, feat, mesh, 2, temp=1.0, return_log_prob=True)
        return jnp.sum(s**2) + jnp.sum(lp**2)

    g0 = jax.grad(loss_seq)(params)
    with mesh:
        g1 = jax.jit(jax.grad(loss_pipe))(params)
    errs = jax.tree_util.tree_map(
        lambda a, b: float(
            jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9)
        ),
        g0, g1,
    )
    assert max(jax.tree_util.tree_leaves(errs)) < 1e-5


def test_pipeline_with_non_realnvp_regressor_raises(setup):
    """A 'pipe' mesh request on a non-realnvp regressor must fail loudly —
    a silent sequential fallback would let GPipe benchmarks measure the
    wrong path (the silent-config-no-op class)."""
    from mhentropy_tpu.models import mhent as mhent_lib
    from mhentropy_tpu.models.encoder import EncoderConfig
    from mhentropy_tpu.models.mhent import MHEntConfig

    cfg, params, mesh, x, feat, cproj = setup
    mcfg = MHEntConfig(
        encoder=EncoderConfig(backbone="resnet18", n_latent=(32, 32)),
        flow=cfg, feat_dim=32, image_size=32, regressor="glow")
    with pytest.raises(NotImplementedError, match="glow"):
        mhent_lib.sample_q_z({}, mcfg, feat, jax.random.key(0), 2,
                             differentiable=True, pipeline=(mesh, 2))
