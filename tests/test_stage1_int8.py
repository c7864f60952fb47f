"""int8 fused stage-1 kernel (models/stage1_int8.py) — interpret mode.

Two references: (a) an exact numpy replica of the kernel's arithmetic
(pins the Pallas lowering bit-for-bit: integer convs are exact and the
f32 epilogues follow the same operation order), and (b) the quant.py
XLA site walk (semantic equivalence; tolerance covers the +-1 requant
ties from different f32 association).
"""

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
import pytest

from mhentropy_tpu.models import stage1_int8

H = W = 16  # hw=256 (hw % 128 == 0); PAD slices need w <= 126


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp)


def _rand_site(key, kshape):
    ks = jax.random.split(key, 4)
    cout = kshape[-1]
    return {
        "w8": jax.random.randint(ks[0], kshape, -90, 90, jnp.int8),
        "scale": jax.random.uniform(ks[1], (cout,), jnp.float32,
                                    2e-4, 2e-3),
        "bias": jax.random.normal(ks[2], (cout,)) * 0.05,
        "inv_sa": jax.random.uniform(ks[3], (), jnp.float32, 30.0, 80.0),
    }


def _sites(key):
    sites = {}
    for j in range(3):
        kj = jax.random.fold_in(key, j)
        ks = jax.random.split(kj, 4)
        cin = 64 if j == 0 else 256
        sites[f"layer1_{j}/conv1"] = _rand_site(ks[0], (1, 1, cin, 64))
        sites[f"layer1_{j}/conv2"] = _rand_site(ks[1], (3, 3, 64, 64))
        sites[f"layer1_{j}/conv3"] = _rand_site(ks[2], (1, 1, 64, 256))
        if j == 0:
            sites["layer1_0/downsample_conv"] = _rand_site(
                ks[3], (1, 1, 64, 256))
    # Downsample shares conv1's activation scale (prepare() pins this).
    sites["layer1_0/downsample_conv"]["inv_sa"] = \
        sites["layer1_0/conv1"]["inv_sa"]
    return sites


def _np_replica(x, sites):
    """The kernel's arithmetic in numpy, channel-major, same op order."""
    def q(v):
        return np.clip(np.round(v), -127, 127).astype(np.int32)

    def site(j, name):
        s = sites[f"layer1_{j}/{name}"]
        return {k: np.asarray(v) for k, v in s.items()}

    b, h, w, _ = x.shape
    hw = h * w
    out = np.zeros((b, hw, 256), np.float32)
    for i in range(b):
        xt = np.asarray(x[i]).reshape(hw, 64).T.astype(np.float32)
        s1 = site(0, "conv1")
        xq = q(xt * s1["inv_sa"])
        prevf = resf = None
        for j in range(3):
            c1 = site(j, "conv1")
            inv2 = site(j, "conv2")["inv_sa"]
            if j == 0:
                w1 = c1["w8"][0, 0].T.astype(np.int32)
                acc = w1 @ xq
                h1 = acc.astype(np.float32) * (c1["scale"] * inv2)[:, None] \
                    + (c1["bias"] * inv2)[:, None]
                ds = site(0, "downsample_conv")
                wd = ds["w8"][0, 0].T.astype(np.int32)
                resf = (wd @ xq).astype(np.float32) * ds["scale"][:, None] \
                    + ds["bias"][:, None]
            else:
                pq = q(prevf * c1["inv_sa"])
                w1 = c1["w8"][0, 0].T.astype(np.int32)
                acc = w1 @ pq
                h1 = acc.astype(np.float32) * (c1["scale"] * inv2)[:, None] \
                    + (c1["bias"] * inv2)[:, None]
            hq = q(np.maximum(h1, 0.0))
            # taps
            hp = np.zeros((64, hw + 2 * stage1_int8.PAD), np.int32)
            hp[:, stage1_int8.PAD:stage1_int8.PAD + hw] = hq
            w_of = (np.arange(hw) % w)[None, :]
            pb = np.zeros((576, hw), np.int32)
            c2 = site(j, "conv2")
            w2 = np.zeros((64, 576), np.int32)
            for p, (dy, dx) in enumerate(stage1_int8.TAPS):
                d = w * dy + dx
                v = hp[:, stage1_int8.PAD + d:stage1_int8.PAD + d + hw]
                if dx == -1:
                    v = np.where(w_of > 0, v, 0)
                elif dx == 1:
                    v = np.where(w_of < w - 1, v, 0)
                pb[64 * p:64 * (p + 1)] = v
                w2[:, 64 * p:64 * (p + 1)] = c2["w8"][dy + 1, dx + 1].T
            inv3 = site(j, "conv3")["inv_sa"]
            h2 = (w2 @ pb).astype(np.float32) \
                * (c2["scale"] * inv3)[:, None] \
                + (c2["bias"] * inv3)[:, None]
            h3q = q(np.maximum(h2, 0.0))
            c3 = site(j, "conv3")
            w3 = c3["w8"][0, 0].T.astype(np.int32)
            y3 = (w3 @ h3q).astype(np.float32) * c3["scale"][:, None] \
                + c3["bias"][:, None]
            prevf = np.maximum(y3 + (resf if j == 0 else prevf), 0.0)
        out[i] = prevf.T
    return out.reshape(b, h, w, 256)


def test_kernel_matches_numpy_replica_exactly():
    sites = _sites(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, H, W, 64), jnp.float32)
    got = stage1_int8.stage1_forward_q(x, sites, out_dtype=jnp.float32)
    ref = _np_replica(np.asarray(x), sites)
    # atol covers f32 FMA-contraction ulps in the epilogues (observed:
    # 4/131072 elements at ~1.6e-5); the integer conv path is exact.
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6, atol=1e-4)


def test_kernel_tracks_xla_quant_walk():
    """Semantic equivalence with the quant._qconv XLA path — different
    f32 association can flip requant ties, so the bound is loose but
    the structure (strides, residuals, site wiring) must agree."""
    from mhentropy_tpu.models import quant

    sites = _sites(jax.random.key(2))
    x = jax.random.normal(jax.random.key(3), (2, H, W, 64), jnp.float32)
    got = np.asarray(stage1_int8.stage1_forward_q(
        x, sites, out_dtype=jnp.float32))

    r = x
    xla = x
    y = jnp.maximum(quant._qconv(xla, sites["layer1_0/conv1"], 1, 0), 0)
    y = jnp.maximum(quant._qconv(y, sites["layer1_0/conv2"], 1, 1), 0)
    y = quant._qconv(y, sites["layer1_0/conv3"], 1, 0)
    rds = quant._qconv(xla, sites["layer1_0/downsample_conv"], 1, 0)
    xla = jnp.maximum(y + rds, 0)
    for j in (1, 2):
        y = jnp.maximum(quant._qconv(xla, sites[f"layer1_{j}/conv1"], 1, 0), 0)
        y = jnp.maximum(quant._qconv(y, sites[f"layer1_{j}/conv2"], 1, 1), 0)
        y = quant._qconv(y, sites[f"layer1_{j}/conv3"], 1, 0)
        xla = jnp.maximum(y + xla, 0)
    xla = np.asarray(xla)
    denom = np.abs(xla).mean() + 1e-9
    assert np.abs(got - xla).mean() / denom < 0.02
    cos = float((got * xla).sum()
                / (np.linalg.norm(got) * np.linalg.norm(xla) + 1e-9))
    assert cos > 0.999, cos


def test_sites_ok_and_supported_gates():
    sites = _sites(jax.random.key(4))
    assert stage1_int8.sites_ok(sites)
    del sites["layer1_1/conv2"]
    assert not stage1_int8.sites_ok(sites)
    x64 = jnp.zeros((1, 64, 64, 64))
    # CPU backend -> gated off regardless of geometry.
    assert not stage1_int8.supported(x64)


def test_cm_s8_emit_matches_quantized_nhwc():
    """emit="cm_s8" is exactly the NHWC output quantized with
    layer2_0/conv1's activation scale, in channel-major layout."""
    sites = _sites(jax.random.key(5))
    inv2 = jnp.float32(41.7)
    sites["layer2_0/conv1"] = {"inv_sa": inv2}
    x = jax.random.normal(jax.random.key(6), (2, H, W, 64), jnp.float32)
    nhwc = np.asarray(stage1_int8.stage1_forward_q(
        x, sites, out_dtype=jnp.float32))
    cm = np.asarray(stage1_int8.stage1_forward_q(
        x, sites, emit="cm_s8"))
    assert cm.shape == (2, 256, H * W) and cm.dtype == np.int8
    want = np.clip(np.round(nhwc.reshape(2, H * W, 256) * float(inv2)),
                   -127, 127).astype(np.int8).transpose(0, 2, 1)
    np.testing.assert_array_equal(cm, want)


def test_nhwc_s8_emit_matches_quantized_nhwc():
    """emit="nhwc_s8" is the NHWC output quantized (from f32, before
    any bf16 truncation) with layer2_0/conv1's scale."""
    sites = _sites(jax.random.key(7))
    inv2 = jnp.float32(37.3)
    sites["layer2_0/conv1"] = {"inv_sa": inv2}
    x = jax.random.normal(jax.random.key(8), (2, H, W, 64), jnp.float32)
    nhwc = np.asarray(stage1_int8.stage1_forward_q(
        x, sites, out_dtype=jnp.float32))
    s8 = np.asarray(stage1_int8.stage1_forward_q(
        x, sites, emit="nhwc_s8"))
    assert s8.shape == (2, H, W, 256) and s8.dtype == np.int8
    want = np.clip(np.round(nhwc * float(inv2)), -127, 127).astype(np.int8)
    np.testing.assert_array_equal(s8, want)


def test_direct_taps_variant_exact():
    """taps="direct" (9 K=64 dots off hpad, no pairbuf) is bit-identical
    to the default pair-GEMM lowering in value semantics."""
    sites = _sites(jax.random.key(9))
    x = jax.random.normal(jax.random.key(10), (2, H, W, 64), jnp.float32)
    a = np.asarray(stage1_int8.stage1_forward_q(
        x, sites, out_dtype=jnp.float32))
    b = np.asarray(stage1_int8.stage1_forward_q(
        x, sites, out_dtype=jnp.float32, taps="direct"))
    np.testing.assert_array_equal(a, b)
