"""BasicEnc: backbone + two linear heads (mu, sigma) with reparameterised
sampling.

Capability parity with /root/reference/hand/network.py:27-140: resnet18/50
features -> l1 (mu) and l2 (sigma) heads, sigma activation 'exp' (l2 is a
log-variance) or 'sigmoid', z = mu + sigma * eps unless deterministic. The
MHEnt model consumes the mu head as the conditioning feature
(network.py:779).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mhentropy_tpu.models import resnet

_PREC = jax.lax.Precision.HIGH


class EncoderConfig(NamedTuple):
    backbone: str = "resnet50"
    n_latent: tuple = (512, 512)  # (mu dim, sigma dim)
    feat_dim: int | None = None  # backbone feature dim override
    sigma_act: str = "exp"
    deterministic: bool = False
    dtype: str = "bfloat16"
    # Fused Pallas stem on the TPU eval path (256px, bf16 only — runtime
    # gated; see models/stem_pallas.py). Full-pipeline A/B in docs/PERF.md.
    pallas_stem: bool = True
    # Fused Pallas stage-1 (three VMEM-resident bottlenecks) on the TPU
    # eval path — see models/stage1_pallas.py. Full-pipeline A/B r3:
    # +6.3% headline (B=32), +14.5% eval shape (B=64); default ON.
    pallas_stage1: bool = True
    # Train-mode BN stats/grad reductions as Pallas kernels
    # (models/bn_pallas.py) — measured LOSS on chip, kept opt-in as the
    # r5 A/B record (docs/PERF.md "BUILT, MEASURED, DISPROVEN"). Eval
    # paths are unaffected (eval BN math is unchanged either way).
    # False | True ("stats" mode) | "full".
    fused_train_bn: bool | str = False

    def resolved_feat_dim(self) -> int:
        return self.feat_dim or resnet.FEAT_DIMS[self.backbone]


def init(key: jax.Array, cfg: EncoderConfig, image_size: int = 256):
    """Returns (params, batch_stats) — stats are model state, not trainables."""
    k_bb, k_l1, k_l2 = jax.random.split(key, 3)
    bb = resnet.make_backbone(cfg.backbone, dtype=jnp.dtype(cfg.dtype),
                              pallas_stem=getattr(cfg, 'pallas_stem', True),
                              pallas_stage1=getattr(cfg, 'pallas_stage1',
                                                    True),
                              fused_train_bn=getattr(cfg, 'fused_train_bn',
                                                     False))
    dummy = jnp.zeros((1, image_size, image_size, 3))
    variables = bb.init(k_bb, dummy, train=False)
    f = cfg.resolved_feat_dim()

    def linear(key, din, dout):
        lim = (1.0 / din) ** 0.5  # torch nn.Linear default init
        kw, kb = jax.random.split(key)
        return {
            "w": jax.random.uniform(kw, (din, dout), jnp.float32, -lim, lim),
            "b": jax.random.uniform(kb, (dout,), jnp.float32, -lim, lim),
        }

    params = {
        "backbone": variables["params"],
        "l1": linear(k_l1, f, cfg.n_latent[0]),
        "l2": linear(k_l2, f, cfg.n_latent[1]),
    }
    return params, variables.get("batch_stats", {})


def backbone_features(
    params: dict,
    batch_stats: dict,
    cfg: EncoderConfig,
    image: jax.Array,
    train: bool = False,
):
    """Raw pooled backbone features (no mu/sd heads): (feats, new_stats).

    The ProHMR engine conditions its flow on these directly
    (models/prohmr.py) — the reference's `self._feat` cache
    (network.py:118)."""
    bb = resnet.make_backbone(cfg.backbone, dtype=jnp.dtype(cfg.dtype),
                              pallas_stem=getattr(cfg, 'pallas_stem', True),
                              pallas_stage1=getattr(cfg, 'pallas_stage1',
                                                    True),
                              fused_train_bn=getattr(cfg, 'fused_train_bn',
                                                     False))
    variables = {"params": params["backbone"], "batch_stats": batch_stats}
    if train:
        feats, mutated = bb.apply(variables, image, train=True, mutable=["batch_stats"])
        new_stats = mutated["batch_stats"]
    else:
        feats = bb.apply(variables, image, train=False)
        new_stats = batch_stats
    return feats, new_stats


def apply(
    params: dict,
    batch_stats: dict,
    cfg: EncoderConfig,
    image: jax.Array,
    key: jax.Array | None = None,
    train: bool = False,
    deterministic: bool = False,
):
    """Returns (z, mn, sd, new_batch_stats).

    image: (B, H, W, 3) NHWC in the dataset's normalisation.
    """
    feats, new_stats = backbone_features(params, batch_stats, cfg, image,
                                         train=train)

    mn = jnp.dot(feats, params["l1"]["w"], precision=_PREC) + params["l1"]["b"]
    sd = jnp.dot(feats, params["l2"]["w"], precision=_PREC) + params["l2"]["b"]
    if cfg.sigma_act == "exp":
        sd = jnp.exp(0.5 * sd)
    elif cfg.sigma_act == "sigmoid":
        sd = jax.nn.sigmoid(sd)

    # mn.shape != sd.shape -> deterministic z is REFERENCE PARITY, not a
    # silent fallback: BasicEnc does exactly this (network.py:132-134).
    if cfg.deterministic or deterministic or mn.shape != sd.shape or key is None:
        z = mn
    else:
        z = mn + sd * jax.random.normal(key, mn.shape)
    return z, mn, sd, new_stats
