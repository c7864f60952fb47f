"""Fused train-mode BN (models/bn_pallas.py) vs flax nn.BatchNorm —
interpret mode on the CPU test platform (the on-TPU A/B is in docs/PERF.md).

The contract: FusedTrainBN is numerically flax's BatchNorm (fwd values,
running-stat updates, AND gradients wrt x/scale/bias), with the same
param/variable paths, so flipping cfg.tpu.fused_train_bn changes nothing
but the speed of the reductions.
"""

import flax.linen as nn
import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
import pytest

from mhentropy_tpu.models import bn_pallas, resnet


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp)
    # supported() gates on the TPU backend (a real CPU pallas_call would
    # crash); interpret mode makes the kernel path exercisable here.
    monkeypatch.setattr(bn_pallas, "_backend_ok", lambda: True)


def _pair(features, use_running_average=False, dtype=None, mode="stats"):
    fused = bn_pallas.FusedTrainBN(
        use_running_average=use_running_average, momentum=0.9,
        epsilon=1e-5, dtype=dtype, mode=mode)
    ref = nn.BatchNorm(
        use_running_average=use_running_average, momentum=0.9,
        epsilon=1e-5, dtype=dtype)
    return fused, ref


@pytest.mark.parametrize("mode", ["stats", "full"])
@pytest.mark.parametrize("shape,dtype", [
    ((4, 8, 8, 128), jnp.float32),   # direct lanes
    ((4, 8, 8, 64), jnp.bfloat16),   # folded lanes (C=64 -> 128)
    ((2, 16, 16, 256), jnp.bfloat16),
])
def test_train_forward_and_stats_match_flax(shape, dtype, mode):
    x = (jax.random.normal(jax.random.key(0), shape) * 2 + 0.5).astype(dtype)
    assert bn_pallas.supported(x)
    fused, ref = _pair(shape[-1], dtype=dtype, mode=mode)
    vf = fused.init(jax.random.key(1), x)
    vr = ref.init(jax.random.key(1), x)
    # Same init tree (paths and values).
    jax.tree.map(np.testing.assert_array_equal, vf, vr)
    # Perturb params so scale/bias actually matter.
    vf = jax.tree.map(lambda a: a + 0.1 if a.ndim == 1 else a, vf)

    yf, mf = fused.apply(vf, x, mutable=["batch_stats"])
    yr, mr = ref.apply(vf, x, mutable=["batch_stats"])
    # bf16 outputs may differ by one ULP where the f32 accumulation order
    # lands a value on a rounding boundary (observed: 1 element in 131k).
    np.testing.assert_allclose(
        np.asarray(yf, np.float32), np.asarray(yr, np.float32),
        atol=5e-6 if dtype == jnp.float32 else 2e-2)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(mf["batch_stats"][k]),
            np.asarray(mr["batch_stats"][k]), rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("mode", ["stats", "full"])
def test_train_gradients_match_flax(mode):
    shape = (4, 8, 8, 128)
    x = jax.random.normal(jax.random.key(2), shape)
    w = jax.random.normal(jax.random.key(3), shape)  # loss weights
    fused, ref = _pair(shape[-1], mode=mode)
    v = ref.init(jax.random.key(1), x)

    def loss(mod):
        def f(params, xx):
            y, _ = mod.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                xx, mutable=["batch_stats"])
            return jnp.sum(y * w)

        return f

    gp_f, gx_f = jax.grad(loss(fused), argnums=(0, 1))(v["params"], x)
    gp_r, gx_r = jax.grad(loss(ref), argnums=(0, 1))(v["params"], x)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-5)
    for k in ("scale", "bias"):
        np.testing.assert_allclose(
            np.asarray(gp_f[k]), np.asarray(gp_r[k]), rtol=1e-4, atol=1e-5)


def test_grad_includes_mean_var_cotangents():
    """A caller differentiating THROUGH the returned batch stats (not just
    y) still gets the exact flax gradient — the custom_vjp carries the
    dmean/dvar terms."""
    shape = (2, 4, 4, 128)
    x = jax.random.normal(jax.random.key(4), shape)
    fused, ref = _pair(shape[-1], mode="full")
    v = ref.init(jax.random.key(1), x)

    def stats_loss(mod):
        def f(xx):
            _, m = mod.apply(v, xx, mutable=["batch_stats"])
            bs = m["batch_stats"]
            return jnp.sum(bs["mean"]) + jnp.sum(bs["var"] * bs["var"])

        return f

    gf = jax.grad(stats_loss(fused))(x)
    gr = jax.grad(stats_loss(ref))(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=1e-4, atol=1e-6)


def test_eval_mode_matches_flax_exactly():
    shape = (3, 8, 8, 64)
    x = (jax.random.normal(jax.random.key(5), shape)).astype(jnp.bfloat16)
    fused, ref = _pair(shape[-1], use_running_average=True,
                       dtype=jnp.bfloat16)
    v = ref.init(jax.random.key(1), x)
    v = {
        "params": {"scale": jnp.full((64,), 1.3), "bias": jnp.full((64,), -0.2)},
        "batch_stats": {"mean": jnp.linspace(-1, 1, 64),
                        "var": jnp.linspace(0.5, 2.0, 64)},
    }
    yf = fused.apply(v, x)
    yr = ref.apply(v, x)
    np.testing.assert_array_equal(np.asarray(yf, np.float32),
                                  np.asarray(yr, np.float32))


def test_unsupported_shapes_fall_back():
    # C=21 can't fill lanes; odd M can't block: both must still be exact.
    for shape in ((3, 5, 5, 21), (3, 3, 3, 128)):
        x = jax.random.normal(jax.random.key(6), shape)
        assert not bn_pallas.supported(x)
        fused, ref = _pair(shape[-1])
        v = ref.init(jax.random.key(1), x)
        yf, mf = fused.apply(v, x, mutable=["batch_stats"])
        yr, mr = ref.apply(v, x, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(yf), np.asarray(yr),
                                   rtol=1e-5, atol=1e-6)
        # The fallback's running-average update must match too (momentum
        # direction bugs would otherwise slip through on y alone).
        jax.tree.map(
            lambda p, q: np.testing.assert_allclose(
                np.asarray(p), np.asarray(q), rtol=1e-5, atol=1e-7),
            mf, mr)


def test_resnet_flag_is_checkpoint_oblivious():
    """Same init tree with the flag on/off; same train-step outputs and
    mutated stats within bf16 tolerance; eval outputs identical."""
    x = jax.random.normal(jax.random.key(7), (2, 32, 32, 3))
    mk = lambda f: resnet.ResNet(  # noqa: E731
        stage_sizes=(1, 1), block_cls=resnet.BasicBlock, num_filters=64,
        dtype=jnp.float32, fused_train_bn=f)
    a, b = mk(False), mk(True)
    va = a.init(jax.random.key(0), x, train=True)
    vb = b.init(jax.random.key(0), x, train=True)
    jax.tree.map(np.testing.assert_array_equal, va, vb)

    ya, ma = a.apply(va, x, train=True, mutable=["batch_stats"])
    yb, mb = b.apply(va, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                               rtol=2e-4, atol=2e-5)
    jax.tree.map(
        lambda p, q: np.testing.assert_allclose(
            np.asarray(p), np.asarray(q), rtol=2e-4, atol=1e-5),
        ma, mb)

    ea = a.apply(va, x, train=False)
    eb = b.apply(va, x, train=False)
    np.testing.assert_allclose(np.asarray(ea), np.asarray(eb),
                               rtol=1e-5, atol=1e-6)


def test_backend_gate_and_mode_validation(monkeypatch):
    """Off-TPU, supported() is False (the XLA fallback runs — a real CPU
    pallas_call would crash, confirmed r5); unknown mode strings raise
    instead of silently running 'stats'."""
    x = jnp.ones((8, 4, 4, 64))
    monkeypatch.setattr(bn_pallas, "_backend_ok", lambda: False)
    assert not bn_pallas.supported(x)
    fused, ref = _pair(64)  # falls back; still flax-exact
    v = ref.init(jax.random.key(0), x)
    yf, _ = fused.apply(v, x, mutable=["batch_stats"])
    yr, _ = ref.apply(v, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yr),
                               rtol=1e-6, atol=1e-7)

    bad = bn_pallas.FusedTrainBN(mode="ful")
    with pytest.raises(ValueError):
        bad.init(jax.random.key(0), x)
