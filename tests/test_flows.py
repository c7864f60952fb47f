import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mhentropy_tpu.flows import realnvp
from mhentropy_tpu.flows.realnvp import RealNVPConfig

REF = "/root/reference/hand"


def small_cfg(**kw):
    base = dict(dim=8, cond_dim=16, h_dim=32, num_steps=2)
    base.update(kw)
    return RealNVPConfig(**base)


def test_forward_inverse_roundtrip():
    cfg = small_cfg()
    params = realnvp.init_params(jax.random.key(0), cfg)
    key = jax.random.key(1)
    x = jax.random.normal(key, (6, cfg.dim))
    feat = jax.random.normal(jax.random.key(2), (6, cfg.cond_dim))
    cproj = realnvp.cond_cache(params, cfg, realnvp.make_cond(params, cfg, feat))
    z, logdet_inv = realnvp.inverse(params, cfg, x, cproj)
    x2, logdet_fwd = realnvp.forward(params, cfg, z, cproj)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(logdet_fwd), -np.asarray(logdet_inv), atol=1e-5
    )


def test_logdet_matches_autodiff_jacobian():
    cfg = small_cfg(cond_dim=0)
    params = realnvp.init_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (3, cfg.dim))

    def inv_one(xi):
        z, _ = realnvp.inverse(params, cfg, xi[None])
        return z[0]

    _, logdet = realnvp.inverse(params, cfg, x)
    for i in range(3):
        jac = jax.jacobian(inv_one)(x[i])
        _, ref = np.linalg.slogdet(np.asarray(jac))
        np.testing.assert_allclose(np.asarray(logdet)[i], ref, atol=1e-4)


def test_sample_and_log_prob_consistent_with_log_prob():
    cfg = small_cfg()
    params = realnvp.init_params(jax.random.key(0), cfg)
    feat = jax.random.normal(jax.random.key(2), (5, cfg.cond_dim))
    cproj = realnvp.cond_cache(params, cfg, realnvp.make_cond(params, cfg, feat))
    x, lp_fwd = realnvp.sample(
        params, cfg, jax.random.key(3), 5, cproj=cproj, temp=1.0, return_log_prob=True
    )
    lp_inv = realnvp.log_prob(params, cfg, x, cproj=cproj)
    np.testing.assert_allclose(np.asarray(lp_fwd), np.asarray(lp_inv), atol=1e-4)


def test_temperature_scales_spread():
    cfg = small_cfg(cond_dim=0)
    params = realnvp.init_params(jax.random.key(0), cfg)
    cold = realnvp.sample(params, cfg, jax.random.key(1), 512, temp=0.1)
    hot = realnvp.sample(params, cfg, jax.random.key(1), 512, temp=1.0)
    assert np.asarray(cold).std() < np.asarray(hot).std() * 0.5


def test_visibility_weights_zero_out_rows():
    cfg = RealNVPConfig(dim=3, cond_dim=4, h_dim=16, num_steps=2, joint_n=4)
    params = realnvp.init_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 12))
    feat = jax.random.normal(jax.random.key(2), (2, 16))  # 4 chunks of 4
    w_all = jnp.ones((2, 12))
    w_none = jnp.zeros((2, 12))
    lp_all = realnvp.log_prob(params, cfg, x, feat=feat, weights=w_all)
    lp_none = realnvp.log_prob(params, cfg, x, feat=feat, weights=w_none)
    np.testing.assert_allclose(np.asarray(lp_none), 0.0, atol=1e-6)
    assert np.all(np.asarray(lp_all) != 0.0)


def test_dim_gt3_weights_all_ones_match_none_else_raise():
    """flows.py:283-284 parity: dim>3 accepts the reference's own all-ones
    default and refuses anything else (a real visibility pattern cannot be
    applied to whole-pose rows)."""
    cfg = small_cfg()  # dim=8
    params = realnvp.init_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (4, cfg.dim))
    feat = jax.random.normal(jax.random.key(2), (4, cfg.cond_dim))
    lp_none = realnvp.log_prob(params, cfg, x, feat=feat)
    lp_ones = realnvp.log_prob(params, cfg, x, feat=feat,
                               weights=jnp.ones_like(x))
    np.testing.assert_allclose(np.asarray(lp_ones), np.asarray(lp_none),
                               atol=1e-6)
    with pytest.raises(NotImplementedError):
        realnvp.log_prob(params, cfg, x, feat=feat,
                         weights=jnp.ones_like(x).at[0, 0].set(0.0))
    # Traced weights can't be inspected -> refused even if all-ones.
    with pytest.raises(NotImplementedError):
        jax.jit(lambda w: realnvp.log_prob(params, cfg, x, feat=feat,
                                           weights=w))(jnp.ones_like(x))


# ---------------------------------------------------------------------------
# Parity vs the actual PyTorch reference implementation (CPU torch), weights
# copied layer by layer. BASELINE north star: log_prob within 1e-4.
# ---------------------------------------------------------------------------


def _torch_reference_flow(cfg, seed=0):
    torch = pytest.importorskip("torch")
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    sys.path.insert(0, REF)
    try:
        import flows as ref_flows
    finally:
        sys.path.pop(0)
    torch.manual_seed(seed)
    ref = ref_flows.RealNVP(
        dim=cfg.dim,
        tsfm_on=cfg.cond_dim,
        kemb=False,
        jointN=cfg.joint_n,
        h_dims=[cfg.h_dim, cfg.h_dim],
        num_steps=cfg.num_steps,
    )
    return ref, torch


def _params_from_torch(ref, cfg):
    """Copy the torch module's weights into our stacked-params layout."""
    import torch

    def t(x):
        return jnp.asarray(x.detach().numpy())

    n_layers = cfg.n_layers
    fields = {k: [] for k in (
        "s_w0 s_b0 s_w1 s_b1 s_w2 s_b2 t_w0 t_b0 t_w1 t_b1 t_w2 t_b2 "
        "s_c0 s_cb0 s_c1 s_cb1 t_c0 t_cb0 t_c1 t_cb1".split()
    )}
    for i in range(n_layers):
        for net, pfx in ((ref.s[i], "s"), (ref.t[i], "t")):
            for j, nm in ((0, "w0"), (1, "w1"), (2, "w2")):
                fields[f"{pfx}_{nm}"].append(t(net.l[j].weight).T)
                fields[f"{pfx}_b{j}"].append(t(net.l[j].bias))
            for j in range(2):
                fields[f"{pfx}_c{j}"].append(t(net.c[j].weight).T)
                fields[f"{pfx}_cb{j}"].append(t(net.c[j].bias))
    stacked = {k: jnp.stack(v) for k, v in fields.items()}
    return realnvp.RealNVPParams(
        masks=jnp.asarray(ref.mask.numpy()),
        **stacked,
        kemb_w0=None, kemb_b0=None, kemb_w1=None, kemb_b1=None,
        part_ws=(), part_bs=(),
    )


def test_log_prob_parity_with_reference():
    cfg = RealNVPConfig(dim=45, cond_dim=64, h_dim=64, num_steps=3, joint_n=21)
    ref, torch = _torch_reference_flow(cfg)
    params = _params_from_torch(ref, cfg)

    rng = np.random.RandomState(0)
    x = rng.randn(8, 45).astype(np.float32)
    feat = rng.randn(8, 64).astype(np.float32)

    with torch.no_grad():
        ref_lp = ref.log_prob(
            torch.from_numpy(x), logvar=torch.from_numpy(feat)
        ).numpy()
    ours = np.asarray(
        realnvp.log_prob(params, cfg, jnp.asarray(x), feat=jnp.asarray(feat))
    )
    np.testing.assert_allclose(ours, ref_lp, atol=1e-4, rtol=1e-5)


def test_sample_parity_with_reference_transform():
    """The reference's sample() is its forward_p on scaled noise; check our
    forward pass maps the same base points to the same outputs."""
    cfg = RealNVPConfig(dim=45, cond_dim=64, h_dim=64, num_steps=3, joint_n=21)
    ref, torch = _torch_reference_flow(cfg)
    params = _params_from_torch(ref, cfg)

    rng = np.random.RandomState(1)
    z = (rng.randn(8, 45) * 0.8).astype(np.float32)
    feat = rng.randn(8, 64).astype(np.float32)

    with torch.no_grad():
        cond = ref.make_cond(torch.from_numpy(feat))
        ref_x = ref.forward_p(torch.from_numpy(z), cond=cond).numpy()
    cproj = realnvp.cond_cache(
        params, cfg, realnvp.make_cond(params, cfg, jnp.asarray(feat))
    )
    ours, _ = realnvp.forward(params, cfg, jnp.asarray(z), cproj)
    np.testing.assert_allclose(np.asarray(ours), ref_x, atol=1e-5, rtol=1e-5)


def test_log_prob_parity_perjoint_mode():
    """dim=3 per-joint independent modelling with feature-chunk conditioning
    and 3-state visibility weights (flows.py:284-320)."""
    cfg = RealNVPConfig(dim=3, cond_dim=8, h_dim=32, num_steps=2, joint_n=21)
    ref, torch = _torch_reference_flow(cfg)
    params = _params_from_torch(ref, cfg)

    rng = np.random.RandomState(2)
    x = rng.randn(4, 63).astype(np.float32)
    feat = rng.randn(4, 8 * 21).astype(np.float32)
    vis = rng.randint(0, 3, (4, 21)).astype(np.float32)
    weights = np.repeat(vis, 3, axis=1)

    with torch.no_grad():
        ref_lp = ref.log_prob(
            torch.from_numpy(x),
            logvar=torch.from_numpy(feat),
            weights=torch.from_numpy(weights) == 1,
        ).numpy()
    ours = np.asarray(
        realnvp.log_prob(
            params, cfg, jnp.asarray(x), feat=jnp.asarray(feat),
            weights=jnp.asarray((weights == 1).astype(np.float32)),
        )
    )
    np.testing.assert_allclose(ours, ref_lp, atol=1e-4, rtol=1e-5)


def test_kemb_joint_embedding_mode():
    """dim=3 per-joint with the DDPM joint-index embedding
    (flows.py:162-185, 247-257)."""
    cfg = RealNVPConfig(dim=3, cond_dim=63, h_dim=16, num_steps=1, joint_n=21,
                        kemb=True)
    params = realnvp.init_params(jax.random.key(0), cfg)
    assert params.kemb_w0 is not None and params.kemb_w0.shape == (63, 63)
    feat = jax.random.normal(jax.random.key(1), (2, 63))
    cond = realnvp.make_cond(params, cfg, feat)
    # Sum fusion since feat dim == kemb_ch == 63.
    assert cond.shape == (42, 63)
    x = jax.random.normal(jax.random.key(2), (2, 63))
    lp = realnvp.log_prob(params, cfg, x, feat=feat)
    assert lp.shape == (2,)
    assert np.all(np.isfinite(np.asarray(lp)))
    # Different joints get different conditioning (the embedding works).
    assert not np.allclose(np.asarray(cond)[0], np.asarray(cond)[1])


def test_partitioner_mode():
    """cond_mapping_dims joint-feature partitioner (flows.py:179-185,
    259-268)."""
    cfg = RealNVPConfig(dim=3, cond_dim=4, h_dim=16, num_steps=1, joint_n=21,
                        cond_mapping_dims=((10, 84),))  # 84 / 21 = 4 per joint
    params = realnvp.init_params(jax.random.key(0), cfg)
    assert len(params.part_ws) == 1 and params.part_ws[0].shape == (10, 84)
    feat = jax.random.normal(jax.random.key(1), (2, 10))
    cond = realnvp.make_cond(params, cfg, feat)
    assert cond.shape == (42, 4)
    x = jax.random.normal(jax.random.key(2), (2, 63))
    lp = realnvp.log_prob(params, cfg, x, feat=feat)
    assert np.all(np.isfinite(np.asarray(lp)))


def test_masks_receive_no_gradient():
    """Masks are a buffer in the reference (flows.py:188), not a parameter —
    training must not move them."""
    cfg = small_cfg()
    params = realnvp.init_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (4, cfg.dim))
    feat = jax.random.normal(jax.random.key(2), (4, cfg.cond_dim))

    def loss(p):
        lp = realnvp.log_prob(p, cfg, x, feat=feat)
        smp = realnvp.sample(p, cfg, jax.random.key(3), 4, feat=feat)
        return -lp.mean() + (smp**2).mean()

    grads = jax.grad(loss)(params)
    np.testing.assert_array_equal(np.asarray(grads.masks), 0.0)
    assert np.abs(np.asarray(grads.s_w0)).max() > 0
