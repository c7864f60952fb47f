"""int8 fused stage-2/3 kernel (models/stage2_int8.py) — interpret mode.

Mirrors tests/test_stage1_int8.py's two-reference strategy: (a) an
exact numpy replica of the kernel arithmetic on a small test geometry
(integer convs exact, f32 epilogues in the same op order), and (b) the
quant._qconv XLA site walk at the real stage-3 geometry (semantic
equivalence; tolerance covers +-1 requant ties).
"""

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
import pytest

from mhentropy_tpu.models import stage2_int8
from mhentropy_tpu.models.stage2_int8 import StageGeom, TAP_GROUPS

TEST_GEOM = StageGeom(width=8, cin=16, cout=32, n_blocks=2, w_in=32)


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


def _sites(key, stage, g):
    sites = {}
    for j in range(g.n_blocks):
        ks = jax.random.split(jax.random.fold_in(key, j), 4)
        cin = g.cin if j == 0 else g.cout
        sites[f"layer{stage}_{j}/conv1"] = _rand_site(
            ks[0], (1, 1, cin, g.width))
        sites[f"layer{stage}_{j}/conv2"] = _rand_site(
            ks[1], (3, 3, g.width, g.width))
        sites[f"layer{stage}_{j}/conv3"] = _rand_site(
            ks[2], (1, 1, g.width, g.cout))
        if j == 0:
            sites[f"layer{stage}_0/downsample_conv"] = _rand_site(
                ks[3], (1, 1, g.cin, g.cout))
    sites[f"layer{stage}_0/downsample_conv"]["inv_sa"] = \
        sites[f"layer{stage}_0/conv1"]["inv_sa"]
    return sites


def _np_replica(x, sites, stage, g):
    """Kernel arithmetic in numpy: channel-major, full-res conv2 then
    stride-2 selection, same op order."""
    def q(v):
        return np.clip(np.round(v), -127, 127).astype(np.int32)

    def site(j, name):
        return {k: np.asarray(v)
                for k, v in sites[f"layer{stage}_{j}/{name}"].items()}

    W = g.width
    b, h, w, _ = x.shape
    hw_in, hw_out = h * w, h * w // 4
    w_out = w // 2
    sel_keep = [(2 * (p // w_out)) * w + 2 * (p % w_out)
                for p in range(hw_out)]
    out = np.zeros((b, hw_out, g.cout), np.float32)
    for i in range(b):
        s1 = site(0, "conv1")
        xt = np.asarray(x[i]).reshape(hw_in, g.cin).T.astype(np.float32)
        xq = q(xt * s1["inv_sa"])
        prevf = None
        for j in range(g.n_blocks):
            c1, c2, c3 = site(j, "conv1"), site(j, "conv2"), site(j, "conv3")
            hw = hw_in if j == 0 else hw_out
            w_img = w if j == 0 else w_out
            src = xq if j == 0 else q(prevf * c1["inv_sa"])
            acc = c1["w8"][0, 0].T.astype(np.int32) @ src
            h1 = acc.astype(np.float32) \
                * (c1["scale"] * c2["inv_sa"])[:, None] \
                + (c1["bias"] * c2["inv_sa"])[:, None]
            hq = q(np.maximum(h1, 0.0))
            hp = np.zeros((W, hw + 2 * stage2_int8.PAD), np.int32)
            hp[:, stage2_int8.PAD:stage2_int8.PAD + hw] = hq
            w_of = (np.arange(hw) % w_img)[None, :]
            acc2 = np.zeros((W, hw), np.int64)
            for taps in TAP_GROUPS:
                for dy, dx in taps:
                    d = w_img * dy + dx
                    v = hp[:, stage2_int8.PAD + d:stage2_int8.PAD + d + hw]
                    if dx == -1:
                        v = np.where(w_of > 0, v, 0)
                    elif dx == 1:
                        v = np.where(w_of < w_img - 1, v, 0)
                    acc2 += c2["w8"][dy + 1, dx + 1].T.astype(np.int64) @ v
            h2 = acc2.astype(np.float32) \
                * (c2["scale"] * c3["inv_sa"])[:, None] \
                + (c2["bias"] * c3["inv_sa"])[:, None]
            h2q = q(np.maximum(h2, 0.0))
            if j == 0:
                h2q = h2q[:, sel_keep]
            y3 = (c3["w8"][0, 0].T.astype(np.int32) @ h2q).astype(np.float32) \
                * c3["scale"][:, None] + c3["bias"][:, None]
            if j == 0:
                ds = site(0, "downsample_conv")
                res = (ds["w8"][0, 0].T.astype(np.int32)
                       @ xq[:, sel_keep]).astype(np.float32) \
                    * ds["scale"][:, None] + ds["bias"][:, None]
            else:
                res = prevf
            prevf = np.maximum(y3 + res, 0.0)
        out[i] = prevf.T
    return out.reshape(b, h // 2, w // 2, g.cout)


def test_kernel_matches_numpy_replica(monkeypatch):
    g = TEST_GEOM
    monkeypatch.setitem(stage2_int8.GEOMS, 9, g)
    sites = _sites(jax.random.key(0), 9, g)
    x = jax.random.normal(jax.random.key(1),
                          (2, g.w_in, g.w_in, g.cin), jnp.float32)
    got = stage2_int8.stage_forward_q(x, sites, stage=9,
                                      out_dtype=jnp.float32)
    ref = _np_replica(np.asarray(x), sites, 9, g)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6, atol=1e-4)


def _run_walk(x, sites, stage, g):
    from mhentropy_tpu.models import quant

    out = x
    for j in range(g.n_blocks):
        stride = 2 if j == 0 else 1
        y = jnp.maximum(
            quant._qconv(out, sites[f"layer{stage}_{j}/conv1"], 1, 0), 0)
        y = jnp.maximum(
            quant._qconv(y, sites[f"layer{stage}_{j}/conv2"], stride, 1), 0)
        y = quant._qconv(y, sites[f"layer{stage}_{j}/conv3"], 1, 0)
        r = quant._qconv(out, sites[f"layer{stage}_0/downsample_conv"],
                         2, 0) if j == 0 else out
        out = jnp.maximum(y + r, 0)
    return np.asarray(out)


def test_kernel_tracks_xla_quant_walk(monkeypatch):
    """Real stage-3 channel geometry (3 blocks) vs the quant._qconv XLA
    path, tight bounds. Depth is capped at 3 because random
    (uncalibrated) sites let activation magnitudes grow per block until
    FMA-vs-mul ulps flip requant ties, which then cascade spatially —
    at 3 blocks the comparison is flip-free (verified) so any outlier
    is a genuine wiring bug."""
    g = StageGeom(width=256, cin=512, cout=1024, n_blocks=3, w_in=32)
    monkeypatch.setitem(stage2_int8.GEOMS, 9, g)
    sites = _sites(jax.random.key(2), 9, g)
    x = jax.random.normal(jax.random.key(3),
                          (1, g.w_in, g.w_in, g.cin), jnp.float32)
    got = np.asarray(stage2_int8.stage_forward_q(
        x, sites, stage=9, out_dtype=jnp.float32))
    xla = _run_walk(x, sites, 9, g).reshape(got.shape)
    rel = np.abs(got - xla) / (np.abs(xla) + 1.0)
    assert np.median(rel) < 1e-5, np.median(rel)
    assert (rel > 0.01).mean() < 0.002, (rel > 0.01).mean()
    cos = float((got * xla).sum()
                / (np.linalg.norm(got) * np.linalg.norm(xla) + 1e-9))
    assert cos > 0.9999, cos


def test_full_stage3_sanity():
    """Full 6-block stage 3: loose (tie cascades allowed), catches
    gross wiring errors only."""
    g = stage2_int8.GEOMS[3]
    sites = _sites(jax.random.key(2), 3, g)
    x = jax.random.normal(jax.random.key(3),
                          (1, g.w_in, g.w_in, g.cin), jnp.float32)
    got = np.asarray(stage2_int8.stage_forward_q(
        x, sites, stage=3, out_dtype=jnp.float32))
    xla = _run_walk(x, sites, 3, g).reshape(got.shape)
    rel = np.abs(got - xla) / (np.abs(xla) + 1.0)
    assert np.median(rel) < 1e-4, np.median(rel)
    cos = float((got * xla).sum()
                / (np.linalg.norm(got) * np.linalg.norm(xla) + 1e-9))
    assert cos > 0.995, cos


def test_gates():
    g2 = stage2_int8.GEOMS[2]
    sites = _sites(jax.random.key(4), 2, g2)
    assert stage2_int8.sites_ok(sites, 2)
    del sites["layer2_1/conv2"]
    assert not stage2_int8.sites_ok(sites, 2)
    x = jnp.zeros((1, 64, 64, 256))
    # CPU backend -> gated off regardless of geometry.
    assert not stage2_int8.supported(x, 2)


def test_cm_in_matches_nhwc_path(monkeypatch):
    """cm_in=True on the pre-quantized channel-major map reproduces the
    NHWC path exactly (the in-kernel quantize/transpose is the only
    difference)."""
    g = TEST_GEOM
    monkeypatch.setitem(stage2_int8.GEOMS, 9, g)
    sites = _sites(jax.random.key(7), 9, g)
    x = jax.random.normal(jax.random.key(8),
                          (2, g.w_in, g.w_in, g.cin), jnp.float32)
    ref = np.asarray(stage2_int8.stage_forward_q(
        x, sites, stage=9, out_dtype=jnp.float32))
    inv = sites["layer9_0/conv1"]["inv_sa"]
    xq = jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)
    x_cm = jnp.transpose(
        xq.reshape(2, g.w_in * g.w_in, g.cin), (0, 2, 1))
    got = np.asarray(stage2_int8.stage_forward_q(
        x_cm, sites, stage=9, out_dtype=jnp.float32, cm_in=True))
    np.testing.assert_array_equal(got, ref)
