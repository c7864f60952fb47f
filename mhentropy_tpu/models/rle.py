"""RLE-style flow density regression (the reference's `p_nf` mode).

Capability parity with /root/reference/hand/CrossModalHand.py:262-346 (the
non-integrated BasicEnc + p_nf path, config-reachable via network.p_nf):

* encoder predicts (mu, logvar) (tsfm_on='x' actnorm mode) or a feature
  (conditional int mode),
* the flow models the density of the GT pose (smoothed by 1e-4 noise),
* the point estimate is the mean of K1=10 tempered (0.8) samples, with the
  per-joint std reported as sigma,
* optional nf_res='rle' adds the Gaussian-Q residual term
  (CrossModalHand.py:337-346; actnorm mode only, like the reference).

The reference's pgm='inv_prob' [z, feature] conditioning
(combine_flow_cond, flows.py:365-370) is NOT implemented here — the
conditional mode conditions on the l2 feature head directly.

All pure functions of (params, batch, rng).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mhentropy_tpu.flows import realnvp
from mhentropy_tpu.flows.realnvp import RealNVPConfig
from mhentropy_tpu.models import encoder
from mhentropy_tpu.models.encoder import EncoderConfig


class RLEConfig(NamedTuple):
    encoder: EncoderConfig = EncoderConfig(backbone="resnet18", n_latent=(63, 63))
    flow: RealNVPConfig = RealNVPConfig(dim=3, tsfm_on="x", h_dim=64, num_steps=3)
    pe: str = "3d"  # '3d' (pose3d) or '2d' (crop_uv)
    k1: int = 10  # samples for the point estimate (CrossModalHand.py:291)
    sample_temp: float = 0.8
    nf_res: str | None = None  # 'rle' -> Gaussian-Q term
    image_size: int = 256


def init(key: jax.Array, cfg: RLEConfig):
    k_enc, k_flow = jax.random.split(key)
    enc_params, batch_stats = encoder.init(k_enc, cfg.encoder, cfg.image_size)
    return {
        "encoder": enc_params,
        "p_nf": realnvp.init_params(k_flow, cfg.flow),
    }, batch_stats


def _encode(params, batch_stats, cfg: RLEConfig, image, train):
    z, mn, sd, new_stats = encoder.apply(
        params["encoder"], batch_stats, cfg.encoder, image,
        key=None, train=train, deterministic=True,
    )
    mu = mn
    logvar = 2.0 * jnp.log(sd)  # the trainer's mu/logvar convention (:251)
    return z, mu, logvar, new_stats


def loss_and_predict(
    params: dict,
    batch_stats: dict,
    cfg: RLEConfig,
    image: jax.Array,
    target: dict,
    key: jax.Array,
    train: bool = True,
) -> tuple[dict, dict]:
    """Returns (output, new_batch_stats). output carries log_p (the loss is
    -log_p.mean()), pose_rgb_sample / pred_jts, sigma_i, xyz or uv for the
    metrics, and log_q when nf_res='rle'."""
    k_noise, k_sample = jax.random.split(key)
    pose_gt = target["pose3d"] if cfg.pe == "3d" else target["crop_uv"]
    vis = None
    if cfg.pe == "2d":
        vis = target.get("target_uv_weight")

    z_enc, mu, logvar, new_stats = _encode(params, batch_stats, cfg, image, train)

    # Density of the (smoothed) GT pose (CrossModalHand.py:276-282).
    tld = pose_gt + jax.random.normal(k_noise, pose_gt.shape) * 1e-4
    feat = logvar if isinstance(cfg.flow.cond_dim, int) and cfg.flow.cond_dim else None
    log_p = realnvp.log_prob(
        params["p_nf"], cfg.flow, tld,
        feat=feat, mu=mu, logvar=logvar, weights=vis,
    )
    out = {"log_p": log_p, "log_phi": log_p}

    # Point estimate: mean of K1 tempered samples (CrossModalHand.py:291-306).
    b = pose_gt.shape[0]
    rows_per_image = pose_gt.shape[1] // cfg.flow.dim
    samples = []
    for i in range(cfg.k1):
        s = realnvp.sample(
            params["p_nf"], cfg.flow, jax.random.fold_in(k_sample, i),
            b * rows_per_image,
            feat=feat, mu=mu, logvar=logvar, temp=cfg.sample_temp,
        )
        samples.append(s.reshape(b, -1))
    samples = jnp.stack(samples)  # (K1, B, DK)
    samples = jax.lax.stop_gradient(samples)
    out["pose_rgb_sample"] = samples.mean(0)
    out["sigma_i"] = samples.std(0, ddof=1).mean()
    if cfg.flow.tsfm_on == "x":
        out["pose_rgb_mu"] = mu
        out["pred_jts"] = mu
    else:
        out["pred_jts"] = out["pose_rgb_sample"]
    if cfg.pe == "3d":
        out["xyz"] = samples
    else:
        out["uv"] = (samples + 1.0) / 2.0 * cfg.image_size

    if cfg.nf_res == "rle":
        # Gaussian-Q residual (CrossModalHand.py:337-346). Only defined
        # in the actnorm mode where (mu, logvar) ARE density statistics;
        # in conditional mode logvar is the feature head — the reference
        # raises NotImplementedError there too (:339-341).
        if cfg.flow.tsfm_on != "x":
            raise NotImplementedError(
                "nf_res='rle' needs tsfm_on='x' (mu/logvar actnorm mode)"
            )
        bar_mu = (pose_gt - mu) * jnp.exp(-0.5 * logvar)
        rows = bar_mu.reshape(-1, cfg.flow.dim)
        w_row = (
            jnp.ones(rows.shape[0])
            if vis is None
            else vis.reshape(-1, cfg.flow.dim)[:, 0]
        )
        import math

        gauss = -0.5 * jnp.sum(rows**2, -1) - 0.5 * cfg.flow.dim * math.log(
            2 * math.pi
        )
        # Stored for the criterion, not folded into log_p — matching the
        # reference, whose MHEntLoss consumes only log_p (criteria.py:55).
        out["log_q"] = (gauss * w_row).reshape(b, -1).sum(1)
    return out, new_stats


def best_hypothesis_uvd(
    samples: jax.Array,
    target: dict,
) -> jax.Array:
    """Human3.6m rel-xyz -> rel-uvd conversion on the best hypothesis
    (CrossModalHand.py:312-330): pick the per-image sample closest to GT,
    lift to absolute metres, perspective-project with the st_cam intrinsics
    packed as (fx, fy, cx, cy), return uvd halved to the RLE [-0.5, 0.5)
    convention.

    Args:
        samples: (K1, B, 3K) relative xyz samples.
        target: pose3d (B, 3K), pose3d_root (B, 3), st_cam (B, 4).
    """
    k1, b, dk = samples.shape
    jpe = (samples - target["pose3d"][None]).reshape(k1, b, -1, 3)
    bh = jnp.linalg.norm(jpe, axis=-1).mean(-1).argmin(0)  # (B,)
    rel = jnp.take_along_axis(samples, bh[None, :, None], axis=0)[0]
    rel = rel.reshape(b, -1, 3)
    abs_xyz = (rel + target["pose3d_root"][:, None, :]) * 1000.0
    st = target["st_cam"]
    uv = (
        st[:, None, :2] / (abs_xyz[..., 2:3] + 1e-16) * abs_xyz[..., :2]
        + st[:, None, 2:4]
    )
    uvd = jnp.concatenate([uv, rel[..., 2:3]], -1) / 2.0
    return uvd.reshape(b, -1)
