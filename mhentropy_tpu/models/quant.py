"""Post-training W8A8 quantization for the eval/serving encoder.

The reference runs its torchvision backbone in f32/amp only
(/root/reference/hand/network.py:56-61); this module is a TPU-native
addition: the v5e MXU runs s8xs8->s32 convolutions ~1.44x faster than
bf16 at this model's stage-2+ shapes (measured, docs/PERF.md "int8
feasibility probe"), so the inference encoder can trade a bounded
quantization error for a large step-time cut.

Scheme (standard static PTQ):
  - Weights: symmetric per-output-channel int8, s_w[c] = max|W[..,c]|/127.
  - Activations: symmetric per-tensor int8 with a static scale calibrated
    on representative images (max|x|/127 at each conv input). Conv inputs
    here are post-ReLU (non-negative), so symmetric costs one sign bit —
    accepted for simplicity; parity bounds are pinned by tests.
  - Eval-mode BatchNorm folds EXACTLY into the requantization affine:
    y = conv_s32 * (s_a * s_w[c] * alpha[c]) + beta[c], with
    alpha = scale/sqrt(var+eps), beta = bias - mean*alpha.
  - Residual adds / ReLU / pooling stay in the float compute dtype.

The stem and (resnet50) stage 1 are NEVER quantized: both run as fused
bf16 Pallas kernels on the eval path (models/{stem,stage1}_pallas.py),
which beat XLA bf16 — and int8 XLA at stage-1's 37%-MXU shapes would
still lose to the 48%-MXU kernel (601 us vs ~710 us at 1.44x). `q_from`
selects the first quantized stage (default 1 = stages 2-4 on resnet50).

Usage:
    spec  = QuantSpec(backbone="resnet50")
    act   = calibrate(spec, params["backbone"], batch_stats, calib_images)
    qtree = prepare(spec, params["backbone"], batch_stats, act)
    feats = backbone_forward(spec, qtree, images)   # == eval features
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

EPS = 1e-5
_ARCH = {"resnet18": ((2, 2, 2, 2), "basic"),
         "resnet50": ((3, 4, 6, 3), "bottleneck")}


class QuantSpec(NamedTuple):
    """Static quantization configuration (not part of the qtree pytree)."""

    backbone: str = "resnet50"
    q_from: int = 1            # first stage index (0-based) to quantize
    dtype: str = "bfloat16"    # float compute dtype for unquantized ops
    pallas_stem: bool = True
    pallas_stage1: bool = True
    # Fused int8 stage-2/3 kernels (models/stage2_int8.py). A documented
    # tri-state: False (default), True (NHWC-s8 mid kernels), "s8"
    # (channel-major s8 handoff from the stage-1 kernel), or "fused"
    # (stage-1 emits straight into the stage-2 kernel). Default OFF:
    # every mode measured a LOSS vs int8 XLA at the headline shape
    # (stage 2: 615 vs 511 us, stage 3: 687 vs 372 — XLA's mid-stage
    # convs pipeline the requant epilogues well). Kept opt-in as the
    # boundary-fusion study substrate (docs/PERF.md).
    pallas_mid: bool | str = False
    # int8 fused stem kernel (models/stem_int8.py). Default OFF:
    # measured LOSS vs the bf16 stem kernel (401 vs 337 us — s8
    # sub-tile im2col stores are masked RMW on (32, 128) tiles and
    # cost more than the halved bytes save; see the module docstring).
    int8_stem: bool = False
    # int8 fused RealNVP sampler (flows/pallas_sampler_int8.py): the
    # eval hypothesis draw runs the W8A8 coupling kernel, consuming a
    # qtree["flow"] FlowQTree calibrated per-eval alongside the encoder
    # sites (`quantize_sampler_into` builds it; the engine/serve
    # quantized-eval paths do so by default for supported RealNVP
    # configs — cfg.tpu.quantize_sampler=False opts out). The sampler is
    # MXU-bound (~66%), where kernel int8 dots measured 1.30x over bf16
    # — unlike the copy-bound stem. Measured full-pipeline win: 1.225M
    # -> 1.288M hypos/s (+5.1%) on top of the int8 encoder at the
    # headline shape (docs/PERF.md).
    int8_sampler: bool = False


def _bn_affine(bn_p: dict, bn_s: dict):
    alpha = bn_p["scale"] / jnp.sqrt(bn_s["var"] + EPS)
    return alpha, bn_p["bias"] - bn_s["mean"] * alpha


def _conv(x, w, stride: int, pad: int, dtype):
    return lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), (stride, stride),
        [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _quantize(x, inv_sa):
    return jnp.clip(jnp.round(x.astype(jnp.float32) * inv_sa),
                    -127, 127).astype(jnp.int8)


def _qconv_pre(xq, site: dict, stride: int, pad: int):
    """int8 conv on an already-quantized input + dequant epilogue."""
    yi = lax.conv_general_dilated(
        xq, site["w8"], (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return yi.astype(jnp.float32) * site["scale"] + site["bias"]


def _qconv(x, site: dict, stride: int, pad: int):
    """int8 conv + dequant. The quantize (round/clip) fuses into the
    producing op; the s32->f32 rescale fuses into the consumer."""
    return _qconv_pre(_quantize(x, site["inv_sa"]), site, stride, pad)


def _stage1_blocks(p: dict, s: dict, n_blocks: int):
    out = []
    for j in range(n_blocks):
        bp, bs = p[f"layer1_{j}"], s[f"layer1_{j}"]

        def bn(name):
            return {**bp[name], "mean": bs[name]["mean"],
                    "var": bs[name]["var"]}

        d = {f"conv{k}": bp[f"conv{k}"]["kernel"] for k in (1, 2, 3)}
        d.update({f"bn{k}": bn(f"bn{k}") for k in (1, 2, 3)})
        if j == 0:
            d["ds_conv"] = bp["downsample_conv"]["kernel"]
            d["ds_bn"] = bn("downsample_bn")
        out.append(d)
    return out


def _int8_stem_ok(spec: QuantSpec, sites, x) -> bool:
    if not (spec.int8_stem and sites is not None
            and "stem/conv1" in sites):
        return False
    from mhentropy_tpu.models import stem_int8

    return stem_int8.supported(x, 64, False)


def _forward(spec: QuantSpec, p: dict, s: dict, sites: dict | None, x,
             collect: dict | None = None):
    """Structural eval-mode forward shared by calibration (collect) and
    quantized inference (sites). Float sites replicate resnet.py's eval
    math exactly (BN folded; bf16 convs; Pallas stem/stage-1 under the
    production gates)."""
    from mhentropy_tpu.models import stage1_pallas, stem_pallas

    if spec.pallas_mid not in (False, True, "s8", "fused"):
        # Tri-state compared by identity below — an unrecognised value
        # (e.g. a config layer stringifying a bool) would silently run
        # the default path while claiming a mid-kernel mode.
        raise ValueError(
            f"QuantSpec.pallas_mid must be False/True/'s8'/'fused', got "
            f"{spec.pallas_mid!r}")
    dtype = jnp.dtype(spec.dtype)
    sizes, kind = _ARCH[spec.backbone]

    if spec.int8_stem and collect is not None:
        # Per-input-channel amax of the normalised image — the stem
        # site quantizes per channel (stem_int8 module docstring).
        collect["stem/conv1"] = jnp.max(
            jnp.abs(x), axis=tuple(range(x.ndim - 1))
        ).astype(jnp.float32)
    if _int8_stem_ok(spec, sites, x):
        from mhentropy_tpu.models import stem_int8

        x = stem_int8.stem_forward_q(
            x, sites["stem/conv1"], compute_dtype=dtype, out_dtype=dtype)
    elif (spec.pallas_stem and dtype == jnp.bfloat16
            and stem_pallas.supported(x, 64, False)):
        x = stem_pallas.stem_forward(
            x, p["conv1"]["kernel"], p["bn1"]["scale"], p["bn1"]["bias"],
            s["bn1"]["mean"], s["bn1"]["var"], eps=EPS,
            compute_dtype=dtype, out_dtype=dtype)
    else:
        alpha, beta = _bn_affine(p["bn1"], s["bn1"])
        x = (_conv(x, p["conv1"]["kernel"], 2, 3, dtype)
             * alpha.astype(dtype) + beta.astype(dtype))
        x = jnp.maximum(x, 0)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

    for i, n_blocks in enumerate(sizes):
        quant_stage = i >= spec.q_from
        if (i == 0 and not quant_stage and kind == "bottleneck"
                and spec.pallas_stage1 and dtype == jnp.bfloat16
                and stage1_pallas.supported(x, 64, n_blocks, False)):
            x = stage1_pallas.stage1_forward(
                x, _stage1_blocks(p, s, n_blocks), eps=EPS,
                compute_dtype=dtype, out_dtype=dtype)
            continue
        if (i == 0 and quant_stage and sites is not None
                and kind == "bottleneck" and spec.pallas_stage1
                and n_blocks == 3):
            # q_from == 0 on TPU: the int8 fused stage-1 kernel
            # (models/stage1_int8.py) — int8 XLA stage 1 loses to the
            # bf16 kernel, but the int8 KERNEL beats both (docs/PERF.md).
            from mhentropy_tpu.models import stage1_int8

            if stage1_int8.supported(x) and stage1_int8.sites_ok(sites):
                emit = "nhwc"
                if (spec.pallas_mid == "s8"
                        and len(sizes) > 1 and "layer2_0/conv1" in sites):
                    # Pre-quantized boundary emit. Opt-in: measured
                    # LOSS (1.022M vs 1.221M) — XLA relayouts the
                    # custom-call's s8 output at more cost than the
                    # saved quantize pass (docs/PERF.md).
                    emit = "nhwc_s8"
                if spec.pallas_mid == "fused":
                    # Full boundary fusion: hand stage 2's KERNEL the
                    # channel-major s8 map (no NHWC transposes at all).
                    from mhentropy_tpu.models import stage2_int8

                    post = jax.ShapeDtypeStruct(
                        (x.shape[0], x.shape[1], x.shape[2], 256), x.dtype)
                    if (stage2_int8.supported(post, 2)
                            and stage2_int8.sites_ok(sites, 2)
                            and sizes[1] == stage2_int8.GEOMS[2].n_blocks):
                        emit = "cm_s8"
                x = stage1_int8.stage1_forward_q(x, sites, out_dtype=dtype,
                                                 emit=emit)
                continue
        if (i == 1 and sites is not None and x.ndim == 3):
            # Channel-major s8 carry from the fused stage-1 emit.
            from mhentropy_tpu.models import stage2_int8

            x = stage2_int8.stage_forward_q(x, sites, stage=2,
                                            out_dtype=dtype, cm_in=True)
            continue
        if (i in (1, 2) and quant_stage and sites is not None
                and kind == "bottleneck" and spec.pallas_mid is True):
            # Fused int8 stage-2/3 kernels (models/stage2_int8.py) as
            # standalone NHWC replacements: measured LOSS vs int8 XLA
            # (docs/PERF.md) — opt-in only.
            from mhentropy_tpu.models import stage2_int8

            stage = i + 1
            if (stage2_int8.supported(x, stage)
                    and stage2_int8.sites_ok(sites, stage)
                    and stage2_int8.GEOMS[stage].n_blocks == n_blocks):
                x = stage2_int8.stage_forward_q(x, sites, stage=stage,
                                                out_dtype=dtype)
                continue
        for j in range(n_blocks):
            stride = 2 if i > 0 and j == 0 else 1
            path = f"layer{i + 1}_{j}"
            int8_block = quant_stage and sites is not None

            def cv(conv_name, bn_name, xin, st, pad, path=path,
                   quant=quant_stage):
                key = f"{path}/{conv_name}"
                if quant and sites is not None:
                    return _qconv(xin, sites[key], st, pad).astype(dtype)
                if quant and collect is not None:
                    collect[key] = jnp.max(jnp.abs(xin)).astype(jnp.float32)
                alpha, beta = _bn_affine(p[path][bn_name], s[path][bn_name])
                y = _conv(xin, p[path][conv_name]["kernel"], st, pad, dtype)
                return y * alpha.astype(dtype) + beta.astype(dtype)

            r = x
            ds_key = f"{path}/downsample_conv"
            if int8_block and ds_key in sites:
                # The block input feeds BOTH conv1 and the downsample; the
                # two sites' activation scales are identical by
                # construction (same calibration tensor), so quantize the
                # big input ONCE — as separate qtree args XLA cannot CSE
                # the two passes (~100 MB of duplicate HBM traffic at the
                # stage-2 boundary alone).
                s1 = sites[f"{path}/conv1"]
                # An int8 x is the stage-1 kernel's pre-quantized
                # boundary emit (already on s1's activation scale).
                xq = x if x.dtype == jnp.int8 else _quantize(x, s1["inv_sa"])
                c1_stride = 1 if kind == "bottleneck" else stride
                c1_pad = 0 if kind == "bottleneck" else 1
                y = jnp.maximum(
                    _qconv_pre(xq, s1, c1_stride, c1_pad).astype(dtype), 0)
                if kind == "bottleneck":
                    y = jnp.maximum(
                        cv("conv2", "bn2", y, stride, 1), 0)
                    y = cv("conv3", "bn3", y, 1, 0)
                else:
                    y = cv("conv2", "bn2", y, 1, 1)
                r = _qconv_pre(xq, sites[ds_key], stride, 0).astype(dtype)
            elif kind == "bottleneck":
                y = jnp.maximum(cv("conv1", "bn1", x, 1, 0), 0)
                y = jnp.maximum(cv("conv2", "bn2", y, stride, 1), 0)
                y = cv("conv3", "bn3", y, 1, 0)
                if r.shape != y.shape:
                    r = cv("downsample_conv", "downsample_bn", x, stride, 0)
            else:
                y = jnp.maximum(cv("conv1", "bn1", x, stride, 1), 0)
                y = cv("conv2", "bn2", y, 1, 1)
                if r.shape != y.shape:
                    r = cv("downsample_conv", "downsample_bn", x, stride, 0)
            x = jnp.maximum(y + r, 0)
    return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)


@functools.lru_cache(maxsize=None)
def _calibrate_fn(spec: QuantSpec):
    """Jitted calibration forward, cached per spec — params/images are
    arguments (not closure constants), so per-epoch recalibration in the
    Experiment eval loop reuses one compiled program."""

    @jax.jit
    def run(params_bb, batch_stats, x):
        collect = {}
        _forward(spec, params_bb, batch_stats, None, x, collect)
        return collect

    return run


def calibrate(spec: QuantSpec, params_bb: dict, batch_stats: dict,
              images) -> dict:
    """Run the float eval forward on representative images, returning
    {site: max|activation|} for every to-be-quantized conv input."""
    return jax.device_get(_calibrate_fn(spec)(params_bb, batch_stats, images))


def prepare(spec: QuantSpec, params_bb: dict, batch_stats: dict,
            act_maxabs: dict) -> dict:
    """Build the quantized-inference pytree: int8 weights + requant
    affines for quantized sites; a stripped float part (stem + stages
    below q_from) for everything else."""
    sizes, kind = _ARCH[spec.backbone]
    sites = {}
    if spec.int8_stem and "stem/conv1" in act_maxabs:
        from mhentropy_tpu.models import stem_int8

        sites["stem/conv1"] = stem_int8.prepare_stem_site(
            params_bb["conv1"]["kernel"], params_bb["bn1"],
            batch_stats["bn1"], act_maxabs["stem/conv1"])
    float_p = {"conv1": params_bb["conv1"], "bn1": params_bb["bn1"]}
    float_s = {"bn1": batch_stats["bn1"]}
    conv_names = (("conv1", "bn1"), ("conv2", "bn2"), ("conv3", "bn3")) \
        if kind == "bottleneck" else (("conv1", "bn1"), ("conv2", "bn2"))
    for i, n_blocks in enumerate(sizes):
        for j in range(n_blocks):
            path = f"layer{i + 1}_{j}"
            if i < spec.q_from:
                float_p[path] = params_bb[path]
                float_s[path] = batch_stats[path]
                continue
            names = list(conv_names)
            if "downsample_conv" in params_bb[path]:
                names.append(("downsample_conv", "downsample_bn"))
            for conv_name, bn_name in names:
                key = f"{path}/{conv_name}"
                w = jnp.asarray(params_bb[path][conv_name]["kernel"],
                                jnp.float32)
                s_w = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0
                s_w_safe = jnp.where(s_w > 0, s_w, 1.0)
                w8 = jnp.clip(jnp.round(w / s_w_safe), -127, 127
                              ).astype(jnp.int8)
                alpha, beta = _bn_affine(params_bb[path][bn_name],
                                         batch_stats[path][bn_name])
                # The downsample consumes the SAME tensor as conv1; pin
                # its activation scale to conv1's so _forward can share
                # one quantize pass between them (exact, not approximate).
                act_key = f"{path}/conv1" if conv_name == "downsample_conv" \
                    else key
                s_a = jnp.float32(act_maxabs[act_key]) / 127.0
                s_a = jnp.where(s_a > 0, s_a, 1.0)
                sites[key] = {
                    "w8": w8,
                    "inv_sa": 1.0 / s_a,
                    "scale": (s_a * s_w_safe * alpha).astype(jnp.float32),
                    "bias": jnp.asarray(beta, jnp.float32),
                }
    return {"float": {"params": float_p, "batch_stats": float_s},
            "sites": sites}


def backbone_forward(spec: QuantSpec, qtree: dict, images) -> jax.Array:
    """Quantized eval-mode feature extraction: (B, H, W, 3) -> (B, feat)."""
    return _forward(spec, qtree["float"]["params"],
                    qtree["float"]["batch_stats"], qtree["sites"], images)


def resolve_q_from(q_from, backbone: str, image_shape) -> int:
    """Resolve the "auto" q_from policy: quantize stage 1 too (q_from=0)
    exactly when the fused int8 stage-1 kernel will run — int8 XLA
    stage 1 loses to the bf16 kernel, but the int8 KERNEL beats both
    (docs/PERF.md: 1.23M vs 1.17M vs 967k at the headline shape)."""
    if q_from != "auto":
        return int(q_from)
    if _ARCH.get(backbone, (None, None))[1] != "bottleneck":
        return 1
    from mhentropy_tpu.models import stage1_int8

    b, h, w = image_shape[0], image_shape[1], image_shape[2]
    post_stem = jax.ShapeDtypeStruct((b, h // 4, w // 4, 64), jnp.bfloat16)
    return 0 if stage1_int8.supported(post_stem) else 1


def quantize_encoder(enc_params: dict, batch_stats: dict, enc_cfg,
                     calib_images, q_from="auto") -> tuple:
    """One-call encoder quantization: returns (spec, qtree) for
    `encoder_feat`. `enc_cfg` is an EncoderConfig; heads stay float.
    q_from="auto" picks 0 (stage 1 int8 through the fused kernel) when
    the kernel's geometry gates pass, else 1."""
    q_from = resolve_q_from(q_from, enc_cfg.backbone, calib_images.shape)
    spec = QuantSpec(
        backbone=enc_cfg.backbone, q_from=q_from, dtype=enc_cfg.dtype,
        pallas_stem=getattr(enc_cfg, "pallas_stem", True),
        pallas_stage1=getattr(enc_cfg, "pallas_stage1", True),
        pallas_mid=getattr(enc_cfg, "pallas_mid", False),
        int8_stem=getattr(enc_cfg, "int8_stem", False))
    act = calibrate(spec, enc_params["backbone"], batch_stats, calib_images)
    return spec, prepare(spec, enc_params["backbone"], batch_stats, act)


def encoder_feat(spec: QuantSpec, qtree: dict, enc_params: dict,
                 images, head: bool = True) -> jax.Array:
    """Quantized equivalent of the eval conditioning feature (the
    encoder's mu head — network.py:779): backbone int8, l1 head f32.
    head=False returns the raw pooled backbone features (the ProHMR
    context, encoder.backbone_features)."""
    feats = backbone_forward(spec, qtree, images)
    if not head:
        return feats
    l1 = enc_params["l1"]
    return jnp.dot(feats, l1["w"],
                   precision=lax.Precision.HIGH) + l1["b"]


def sampler_supported(model_cfg) -> bool:
    """True when the int8 fused RealNVP sampler can serve this model: a
    RealNVP regressor whose dim fits one lane tile, with the fused-sampler
    kill switch (MHEntConfig.use_pallas_sampler=False) not engaged. Shape
    gates only — backend-independent, because `sample_fused_q` emulates
    the identical quantized arithmetic through XLA off-TPU."""
    from mhentropy_tpu.flows import pallas_sampler_int8 as q8

    return (getattr(model_cfg, "regressor", None) == "realnvp"
            and q8.shape_ok(model_cfg.flow)
            and model_cfg.use_pallas_sampler is not False)


def quantize_sampler_into(spec: QuantSpec, qtree: dict, params: dict,
                          flow_cfg, calib_images, key=None,
                          temp: float = 0.8) -> tuple:
    """Extend an encoder (spec, qtree) with the int8 fused RealNVP
    sampler: calibrates the flow's activation amaxes on the QUANTIZED
    encoder's features (the distribution the sampler will actually see)
    and attaches the FlowQTree as qtree["flow"].

    temp must be >= the largest sampling temperature the tree will serve
    — activation scales are amaxes of a temp-scaled trajectory, so a
    hotter draw than calibrated saturates the first-layer int8 clip
    (quality degrades silently). Engine eval calibrates at its exact
    eval_temp; serving calibrates at max(1, temp) to cover per-request
    overrides."""
    from mhentropy_tpu.flows import pallas_sampler_int8 as q8

    feat = encoder_feat(spec, qtree, params["encoder"], calib_images)
    if key is None:
        key = jax.random.key(17)  # calibration is deterministic by design
    qtree = dict(qtree)
    qtree["flow"] = q8.quantize_sampler(params["flow"], flow_cfg, feat,
                                        key, temp=temp)
    return spec._replace(int8_sampler=True), qtree
