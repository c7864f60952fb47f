"""W8A8 post-training quantization (models/quant.py).

The quantized eval encoder must (a) replicate the flax eval forward
exactly when run in float mode (the structural walk is the spine both
calibration and int8 inference share), and (b) track the float features
within tight PTQ bounds — the conditioning feature feeds a density
model, so feature fidelity is the whole accuracy story.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mhentropy_tpu.models import encoder, quant, resnet


def _setup(name, dtype="float32", img=32, batch=4, seed=0):
    cfg = encoder.EncoderConfig(backbone=name, n_latent=(32, 32), dtype=dtype)
    params, stats = encoder.init(jax.random.key(seed), cfg, image_size=img)
    # Perturb BN stats so the eval-BN fold is exercised with mean != 0,
    # var != 1 (fresh init would hide a fold sign error).
    stats = jax.tree.map(lambda v: v + 0.03, stats)
    x = jax.random.normal(jax.random.key(seed + 1), (batch, img, img, 3))
    return cfg, params, stats, x


@pytest.mark.parametrize("name", ["resnet18", "resnet50"])
def test_float_structural_forward_matches_flax(name):
    cfg, params, stats, x = _setup(name)
    bb = resnet.make_backbone(name, dtype=jnp.float32)
    ref = bb.apply({"params": params["backbone"], "batch_stats": stats},
                   x, train=False)
    spec = quant.QuantSpec(backbone=name, q_from=1, dtype="float32")
    got = quant._forward(spec, params["backbone"], stats, None, x)
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-5 * float(
        jnp.max(jnp.abs(ref))))


@pytest.mark.parametrize("name,q_from", [
    ("resnet18", 0), ("resnet18", 1), ("resnet50", 1), ("resnet50", 2),
])
def test_quantized_features_track_float(name, q_from):
    cfg, params, stats, x = _setup(name)
    bb = resnet.make_backbone(name, dtype=jnp.float32)
    ref = bb.apply({"params": params["backbone"], "batch_stats": stats},
                   x, train=False)
    spec = quant.QuantSpec(backbone=name, q_from=q_from, dtype="float32")
    act = quant.calibrate(spec, params["backbone"], stats, x)
    qt = quant.prepare(spec, params["backbone"], stats, act)
    got = quant.backbone_forward(spec, qt, x)
    cos = float(jnp.vdot(got, ref)
                / (jnp.linalg.norm(got) * jnp.linalg.norm(ref)))
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert cos > 0.995, (name, q_from, cos)
    assert rel < 0.08, (name, q_from, rel)


def test_qtree_layout_and_stripping():
    """Quantized sites hold int8 weights; the float part keeps only the
    stem + stages below q_from (no duplicate f32 copies of quantized
    kernels)."""
    _, params, stats, x = _setup("resnet50")
    spec = quant.QuantSpec(backbone="resnet50", q_from=1, dtype="float32")
    act = quant.calibrate(spec, params["backbone"], stats, x)
    qt = quant.prepare(spec, params["backbone"], stats, act)
    assert all(s["w8"].dtype == jnp.int8 for s in qt["sites"].values())
    # stage 1 (3 blocks) float; stages 2-4 (4+6+3 blocks) quantized.
    fkeys = set(qt["float"]["params"])
    assert {"conv1", "bn1", "layer1_0", "layer1_1", "layer1_2"} == fkeys
    n_convs = 3 * (4 + 6 + 3) + 3  # three 1x1/3x3 per block + downsamples
    assert len(qt["sites"]) == n_convs
    # Per-channel scales: one per output channel.
    s = qt["sites"]["layer2_0/conv2"]
    assert s["scale"].shape == (128,) and s["bias"].shape == (128,)


def test_dead_channel_and_zero_activation_are_safe():
    """All-zero kernels (dead channels) and an all-zero calibration image
    must not produce NaN/inf scales."""
    _, params, stats, _ = _setup("resnet18")
    k = np.array(params["backbone"]["layer2_0"]["conv1"]["kernel"])
    k[..., 0] = 0.0
    params["backbone"]["layer2_0"]["conv1"]["kernel"] = jnp.asarray(k)
    x = jnp.zeros((2, 32, 32, 3))
    spec = quant.QuantSpec(backbone="resnet18", q_from=1, dtype="float32")
    act = quant.calibrate(spec, params["backbone"], stats, x)
    qt = quant.prepare(spec, params["backbone"], stats, act)
    out = quant.backbone_forward(spec, qt, x)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_encoder_feat_matches_float_mu():
    """The quantized conditioning feature (mu head over int8 features)
    tracks the float eval mu head."""
    cfg, params, stats, x = _setup("resnet50")
    cfg = cfg._replace(dtype="float32")
    _, mn, _, _ = encoder.apply(params, stats, cfg, x, key=None, train=False)
    spec, qt = quant.quantize_encoder(params, stats, cfg, x, q_from=1)
    got = quant.encoder_feat(spec, qt, params, x)
    assert got.shape == mn.shape
    cos = float(jnp.vdot(got, mn)
                / (jnp.linalg.norm(got) * jnp.linalg.norm(mn) + 1e-9))
    assert cos > 0.99, cos


def test_int8_stem_wiring(monkeypatch):
    """QuantSpec(int8_stem=True): calibration collects the per-channel
    stem amax, prepare() builds the stem site, and _forward dispatches
    through it. The kernel is substituted with its XLA-equivalent math
    (kernel ≡ XLA is tests/test_stem_int8.py's job); this pins the
    plumbing — site schema, fold inputs, dtype flow."""
    from mhentropy_tpu.models import stem_int8

    monkeypatch.setattr(stem_int8, "supported", lambda x, f, train: True)
    used = {}

    def xla_equiv(image, site, compute_dtype=jnp.bfloat16,
                  out_dtype=jnp.bfloat16):
        used["site"] = site
        return stem_int8.xla_reference(image, site, out_dtype=out_dtype)

    monkeypatch.setattr(stem_int8, "stem_forward_q", xla_equiv)

    _, params, stats, x = _setup("resnet50")
    bb = resnet.make_backbone("resnet50", dtype=jnp.float32)
    ref = bb.apply({"params": params["backbone"], "batch_stats": stats},
                   x, train=False)
    spec = quant.QuantSpec(backbone="resnet50", q_from=1, dtype="float32",
                           int8_stem=True)
    act = quant.calibrate(spec, params["backbone"], stats, x)
    assert act["stem/conv1"].shape == (3,)
    qt = quant.prepare(spec, params["backbone"], stats, act)
    site = qt["sites"]["stem/conv1"]
    assert site["w8"].shape == (7, 7, 3, 64) and site["w8"].dtype == jnp.int8
    assert site["inv_a"].shape == (3,) and site["scale"].shape == (64,)
    got = quant.backbone_forward(spec, qt, x)
    assert "site" in used  # the stem actually dispatched through int8
    cos = float(jnp.vdot(got, ref)
                / (jnp.linalg.norm(got) * jnp.linalg.norm(ref)))
    assert cos > 0.99, cos


def test_resolve_q_from_auto(monkeypatch):
    """"auto" picks stage-1 quantization exactly when the fused int8
    stage-1 kernel's gates pass (TPU backend + kernel geometry)."""
    import jax as _jax

    # Explicit values pass through, including "0"/"1" strings (the YAML
    # override path — cfg.tpu.quantize_q_from has schema type str).
    assert quant.resolve_q_from(1, "resnet50", (32, 256, 256, 3)) == 1
    assert quant.resolve_q_from("0", "resnet50", (32, 256, 256, 3)) == 0
    # CPU backend: auto stays at 1 regardless of geometry.
    assert quant.resolve_q_from("auto", "resnet50", (32, 256, 256, 3)) == 1
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    assert quant.resolve_q_from("auto", "resnet50", (32, 256, 256, 3)) == 0
    # Basic blocks (resnet18) have no stage-1 kernel.
    assert quant.resolve_q_from("auto", "resnet18", (32, 256, 256, 3)) == 1
    # Geometry the kernel rejects (post-stem hw below the win gate).
    assert quant.resolve_q_from("auto", "resnet50", (32, 128, 128, 3)) == 1
