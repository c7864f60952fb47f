"""ProHMR-style human body model: conditional flow over SMPL pose.

The reference's 'Humans' variant is weights-only — its SMPL flows plug into
the external ProHMR codebase (/root/reference/README.md:26-42). This module
is that engine rebuilt here (BASELINE.json config 5): a ResNet-50 context
feature conditions a Glow flow over the 144-dim 6D-rotation SMPL pose;
deterministic heads predict betas and a weak-perspective camera; N-hypothesis
sampling decodes every hypothesis through core/smpl and projects keypoints.

Training objective (ProHMR semantics): pose NLL under the flow + optional
keypoint reprojection on the flow mode (z=0 sample). tools/convert_torch
gains the checkpoint mapping for the released SMPL-flow weights; the
architecture (dims, layer counts) matches ConditionalGlow(144, 1024, 4, 2,
context=2048).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mhentropy_tpu.core import smpl as smpl_lib
from mhentropy_tpu.core.smpl import SmplModel
from mhentropy_tpu.flows import glow as glow_lib
from mhentropy_tpu.flows.glow import GlowConfig
from mhentropy_tpu.models import encoder
from mhentropy_tpu.models.encoder import EncoderConfig

_PREC = jax.lax.Precision.HIGH

POSE_DIM = 24 * 6  # 6D rotations


class ProHMRConfig(NamedTuple):
    # n_latent=(1, 1): the mu/sd heads are UNUSED here — the flow
    # conditions on the raw pooled backbone features (ProHMR semantics,
    # encoder.backbone_features); 2048-wide heads were 4.2M dead params
    # in every checkpoint and Adam moment.
    encoder: EncoderConfig = EncoderConfig(
        backbone="resnet50", n_latent=(1, 1), sigma_act="exp"
    )
    flow: GlowConfig = GlowConfig(
        features=POSE_DIM, hidden=1024, num_layers=4, num_blocks=2,
        context_features=2048,
    )
    image_size: int = 224
    n_train_hypotheses: int = 2  # ProHMR trains with mode + 1 sample
    # None -> auto: fused Pallas glow sampler on the TPU backend when the
    # architecture qualifies (2 residual blocks, no BN). Full-pipeline A/B
    # at ProHMR shapes recorded in docs/PERF.md.
    use_pallas_sampler: bool | None = None


def init(key: jax.Array, cfg: ProHMRConfig):
    k_enc, k_flow, k_b, k_c = jax.random.split(key, 4)
    enc_params, batch_stats = encoder.init(k_enc, cfg.encoder, cfg.image_size)

    def linear(key, din, dout, scale=1e-2):
        kw, _ = jax.random.split(key)
        return {
            "w": jax.random.normal(kw, (din, dout)) * scale,
            "b": jnp.zeros(dout),
        }

    c = cfg.flow.context_features
    params = {
        "encoder": enc_params,
        "flow": glow_lib.init_params(k_flow, cfg.flow),
        "betas_head": linear(k_b, c, 10),
        "cam_head": linear(k_c, c, 3),
    }
    return params, batch_stats


def _context_from_feats(params, cfg: ProHMRConfig, feats):
    """At the real ProHMR geometry (pooled dim == flow context dim) the
    raw backbone features ARE the context — a released flow was trained
    against exactly these, so no randomly-initialised head may sit in
    between. Mismatched (e.g. tiny test) geometries project through the
    l1 head, which trains through the flow like any context projection."""
    if feats.shape[-1] == cfg.flow.context_features:
        return feats
    l1 = params["encoder"]["l1"]
    return jnp.dot(feats, l1["w"], precision=_PREC) + l1["b"]


def context_features(params, batch_stats, cfg: ProHMRConfig, image, train=False):
    """The flow context: raw pooled backbone features (ProHMR semantics;
    see _context_from_feats for the mismatched-geometry projection)."""
    feats, new_stats = encoder.backbone_features(
        params["encoder"], batch_stats, cfg.encoder, image, train=train
    )
    return _context_from_feats(params, cfg, feats), new_stats


def heads(params, feat):
    betas = jnp.dot(feat, params["betas_head"]["w"], precision=_PREC) + params[
        "betas_head"
    ]["b"]
    cam = jnp.dot(feat, params["cam_head"]["w"], precision=_PREC) + params[
        "cam_head"
    ]["b"]
    # Positive scale via exp on cam[0] at use sites.
    return betas, cam


def nll_loss(
    model: SmplModel,
    params: dict,
    batch_stats: dict,
    cfg: ProHMRConfig,
    image: jax.Array,
    target: dict,
    key: jax.Array,
    train: bool = True,
):
    """Pose NLL + betas/keypoint supervision when available.

    target: pose_6d (B, 144) GT SMPL pose in 6D; optional betas (B, 10),
    keypoints3d (B, K, 3).
    """
    feat, new_stats = context_features(params, batch_stats, cfg, image, train)
    lp = glow_lib.log_prob(params["flow"], target["pose_6d"], feat, cfg=cfg.flow)
    out = {"log_p": lp}
    betas, cam = heads(params, feat)
    out["betas"] = betas
    out["cam"] = cam
    if "betas" in target:
        out["betas_l2"] = jnp.sum((betas - target["betas"]) ** 2, axis=1)
    if "keypoints3d" in target or "keypoints2d" in target:
        # ProHMR's decode supervision: the z=0 mode PLUS
        # (n_train_hypotheses - 1) random samples decode through SMPL —
        # ProHMR applies the keypoint losses to the mode and the samples
        # alike (its num_samples=2 training scheme). 3D keypoints
        # supervise pose/betas; the 2D reprojection is the ONLY gradient
        # the cam head gets (without it the camera stayed at random init
        # — review finding). Eval-mode calls supervise the mode only.
        from mhentropy_tpu.core import camera

        b = image.shape[0]
        n_tr = max(1, int(cfg.n_train_hypotheses)) if train else 1
        noise = jnp.zeros((b, POSE_DIM))
        if n_tr > 1:
            key, k_noise = jax.random.split(key)
            noise = jnp.concatenate(
                [noise,
                 jax.random.normal(k_noise, ((n_tr - 1) * b, POSE_DIM))])
        pose_s, _ = glow_lib.sample_and_log_prob(
            params["flow"], feat, key, n_tr, cfg=cfg.flow,
            noise=noise, train=train,
        )
        _, joints = smpl_lib.smpl_forward_6d(
            model, pose_s, jnp.tile(betas, (n_tr, 1)))
        if "keypoints3d" in target:
            gt3 = jnp.tile(target["keypoints3d"], (n_tr, 1, 1))
            kp3 = jnp.abs(
                (joints - joints[:, 0:1]) - (gt3 - gt3[:, 0:1])
            ).mean(axis=(1, 2))
            out["kp3d_l1"] = kp3.reshape(n_tr, b).mean(0)
        if "keypoints2d" in target:
            uv = camera.orth_project(
                joints, jnp.tile(jnp.exp(cam[:, 0:1]), (n_tr, 1)),
                jnp.tile(cam[:, 1:3], (n_tr, 1)), inv_norm=False,
            )
            kp2 = jnp.abs(
                uv - jnp.tile(target["keypoints2d"], (n_tr, 1, 1))
            ).mean(axis=(1, 2))
            out["kp2d_l1"] = kp2.reshape(n_tr, b).mean(0)
    return out, new_stats


def sample_hypotheses(
    model: SmplModel,
    params: dict,
    batch_stats: dict,
    cfg: ProHMRConfig,
    image: jax.Array,
    key: jax.Array,
    n: int = 100,
    temp: float = 1.0,
    quant=None,
):
    """N SMPL hypotheses per image: flow sample -> 6D -> rotmats -> LBS ->
    weak-perspective keypoint projection.

    Returns dict with pose_6d (N, B, 144), verts (N, B, V, 3),
    joints3d (N, B, 24, 3), uv (N, B, 24, 2), betas (B, 10), cam (B, 3).

    quant: optional (QuantSpec, qtree) — int8 W8A8 context encoder
    (models/quant.py), same serving option as the MHEnt pipeline.
    """
    b = image.shape[0]
    if quant is not None:
        from mhentropy_tpu.models import quant as quant_mod

        feat = _context_from_feats(
            params, cfg,
            quant_mod.encoder_feat(quant[0], quant[1], params["encoder"],
                                   image, head=False))
    else:
        feat, _ = context_features(params, batch_stats, cfg, image,
                                   train=False)
    use_fused = cfg.use_pallas_sampler
    if use_fused is None:
        from mhentropy_tpu.flows import pallas_glow_sampler

        use_fused = pallas_glow_sampler.supported(cfg.flow)
    if use_fused:
        from mhentropy_tpu.flows import pallas_glow_sampler

        pose, log_q = pallas_glow_sampler.sample_and_log_prob_fused(
            params["flow"], feat, key, n, temp=temp, cfg=cfg.flow
        )
    else:
        pose, log_q = glow_lib.sample_and_log_prob(
            params["flow"], feat, key, n, temp=temp, cfg=cfg.flow
        )
    betas, cam = heads(params, feat)
    betas_n = jnp.tile(betas, (n, 1))
    from mhentropy_tpu.core import lbs_pallas

    verts, joints = smpl_lib.smpl_forward_6d(
        model, pose, betas_n,
        # Fused LBS blend (inference-only; same row gate as MANO).
        pallas_lbs=lbs_pallas.supported(pose.shape[0],
                                        model.lbs_weights.shape[0]),
    )
    from mhentropy_tpu.core import camera

    uv = camera.orth_project(
        joints, jnp.tile(jnp.exp(cam[:, 0:1]), (n, 1)),
        jnp.tile(cam[:, 1:3], (n, 1)), inv_norm=False,
    )  # one weak-perspective convention (shared with mhent/render)
    return {
        "pose_6d": pose.reshape(n, b, POSE_DIM),
        "log_q": log_q.reshape(n, b),
        "verts": verts.reshape(n, b, *verts.shape[1:]),
        "joints3d": joints.reshape(n, b, 24, 3),
        "uv": uv.reshape(n, b, 24, 2),
        "betas": betas,
        "cam": cam,
    }


def multi_hypothesis_metrics(samples: dict, target: dict) -> dict:
    """Best/mean-hypothesis MPJPE over the 24 SMPL joints (mm), the 3DPW-style
    multi-hypothesis eval of BASELINE config 5.

    Pelvis(joint 0)-aligned on BOTH sides: predictions sit in the SMPL
    canonical frame (no transl output) while real 3DPW GT is camera-frame
    — the standard protocol subtracts the root before the norm. PJD
    follows the reference's calc order (criteria.py:160-162: per-joint
    volume^(1/3), THEN the joint mean), in mm, zeros at N == 1 like the
    reference's ddof=1 guard."""
    gt = target["joints3d"]  # (B, 24, 3) metres
    pred = samples["joints3d"]  # (N, B, 24, 3)
    pred_a = pred - pred[..., 0:1, :]
    gt_a = gt - gt[:, 0:1, :]
    err = jnp.linalg.norm(pred_a - gt_a[None], axis=-1).mean(-1) * 1000.0
    n = pred.shape[0]
    if n > 1:
        vol = (pred_a * 1000.0).std(0, ddof=1).prod(-1)  # (B, 24) mm^3
        pjd = (vol ** (1.0 / 3.0)).mean(-1) * 3.0**0.5
    else:
        pjd = jnp.zeros(pred.shape[1])
    return {
        "mpjpe_bh": err.min(0),
        "mpjpe_mean": err.mean(0),
        "pjd_3d": pjd,
    }
