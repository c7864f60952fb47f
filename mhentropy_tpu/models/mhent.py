"""MHEnt: the probabilistic hand-mesh-recovery model (the paper's method).

Capability parity with /root/reference/hand/network.py:309-887 — the PGM
I -> z = (theta3, theta45, beta, log s, t) -> y with:

* a ResNet conditioning feature (the mu head of BasicEnc, network.py:779),
* a conditional RealNVP posterior over theta45 (network.py:339-341),
* a deterministic head for (theta3, beta, log s, t) (network.py:376-385),
* MANO decode + orthographic reprojection (network.py:541-558),
* Laplace-with-deadzone reprojection likelihood on visible 2D keypoints
  (network.py:390-400, 627-643),
* smooth-uniform priors on theta45 (PCA +-2), theta3 (ball pi), beta
  (+-0.03) (network.py:429-435),
* the entropy term of the reverse-KL objective (network.py:796-808),
* N-hypothesis sampling with optional top-N_quant filtering by log q
  (network.py:846-883) and KLD-weight annealing (network.py:885-887).

TPU-first design: everything is a pure function of (params, batch, rng); the
hypothesis axis folds into the row axis so all matmuls stay large on the MXU;
the flow conditioning projections are computed once per image and broadcast
across hypotheses (see flows/realnvp.py); `sample_and_log_prob` yields the
entropy term from the same forward pass instead of a second inverse pass.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mhentropy_tpu.core import camera, mano, skeletons
from mhentropy_tpu.core.mano import ManoConfig, ManoModel
from mhentropy_tpu.flows import priors, realnvp
from mhentropy_tpu.flows.realnvp import RealNVPConfig
from mhentropy_tpu.models import encoder
from mhentropy_tpu.models.encoder import EncoderConfig

_PREC = jax.lax.Precision.HIGH

# z layout (network.py:367-373).
ZDIMS = (("th3", 3), ("th45", 45), ("bt", 10), ("logs", 1), ("t", 2))
Z_TOTAL = 61
TH_BT = 58  # theta(48) ++ beta(10)


class MHEntConfig(NamedTuple):
    encoder: EncoderConfig = EncoderConfig()
    flow: RealNVPConfig = RealNVPConfig(dim=45, cond_dim=512, h_dim=512, num_steps=6)
    mano: ManoConfig = ManoConfig(use_pca=True, ncomps=45, flat_hand_mean=False)
    regressor: str = "realnvp"  # 'realnvp' | 'glow' | 'det'
    ds: str = "ho3d"
    image_size: int = 256
    feat_dim: int = 512  # conditioning feature dim (the mu head)
    b_2d: float = 0.03  # Laplace scale for p(uv | z)
    b_3d: float = 0.03  # Laplace scale for p(xyz | z)
    th45_ref_alpha: float = 50.0
    th3_ref_alpha: float = 5.0
    bt_alpha: float = 50.0
    temperature: float = 1.0  # T in log_p / T
    entropy: bool = True
    kld_w: float = 1.0
    kld_w_annealing: tuple = (1.0, 24000)
    n_train_hypotheses: int = 10  # N (network.py:780)
    use_pallas_sampler: bool | None = None  # None -> auto (TPU backend only)
    glow_dropout: float = 0.2  # ConditionalGlow coupling-net dropout
    # ConditionalGlow(45, 512, 4, 2, ...) is the reference's hardcoded
    # posterior shape (network.py:343-344) — these defaults ARE parity.
    # Overridable so smoke/CI runs can trace a smaller glow (the sampling
    # path reads the size back from the params via glow.infer_config, so
    # everything downstream adapts).
    glow_hidden: int = 512
    glow_layers: int = 4
    glow_blocks: int = 2
    use_chamfer_loss: bool = False  # hand-object chamfer term (network.py:821-826)
    w_chamfer: float = 10.0
    # Mask-reconstruction likelihood p(m | z) — the reference sketched this
    # via the commented-out p_m_giv_mu (network.py:394) but its renderer was
    # dead; functional here through core/render.
    use_mask_loss: bool = False
    b_mask: float = 0.02  # Laplace scale, like b_2d/b_3d
    # Measured fused-sampler dispatch thresholds (rows = N*B):
    # * inference: the kernel beats the XLA scan at EVERY row count in the
    #   honest full-pipeline sweep (r2, scanned steps with per-step images):
    #   rows 320: 4.95 vs 5.11 ms; 1k: 5.08 vs 5.67; 2k: 5.67 vs 7.15;
    #   3.2k: 5.94 vs 8.45 — so the row threshold defaults to 0.
    # * training: the custom-VJP backward re-runs the XLA forward for
    #   residuals, so kernel-under-grad is strictly more work at ANY row
    #   count (168 ms vs 33 ms/step at 320 rows measured) — it is used only
    #   when use_pallas_sampler is force-True.
    pallas_min_rows: int = 0

    def det_dims(self) -> int:
        # th45 is deterministic only in 'det' mode; everything else always is.
        d = 3 + 10 + 1 + 2
        if self.regressor == "det":
            d += 45
        return d


def make_priors(cfg: MHEntConfig) -> dict:
    """The operative z-priors (network.py:427-435)."""
    out = {}
    if cfg.mano.use_pca:
        out["th45_ref"] = priors.ApproxUniform(-2.0, 2.0, alpha=cfg.th45_ref_alpha)
    else:
        out["th45_ref"] = priors.ApproxUniform(
            jnp.zeros(45), math.pi, alpha=cfg.th45_ref_alpha, sup="ball"
        )
    out["th3_ref"] = priors.ApproxUniform(
        jnp.zeros(3), math.pi, alpha=cfg.th3_ref_alpha, sup="ball"
    )
    out["bt"] = priors.ApproxUniform(-0.03, 0.03, alpha=cfg.bt_alpha)
    return out


def init(key: jax.Array, cfg: MHEntConfig):
    """Returns (params, batch_stats)."""
    k_enc, k_flow, k_d0, k_d1 = jax.random.split(key, 4)
    enc_params, batch_stats = encoder.init(k_enc, cfg.encoder, cfg.image_size)
    params = {"encoder": enc_params}
    if cfg.regressor == "realnvp":
        params["flow"] = realnvp.init_params(k_flow, cfg.flow)
    elif cfg.regressor == "glow":
        from mhentropy_tpu.flows import glow as glow_lib

        # ConditionalGlow(45, 512, 4, 2, context=512, dropout=0.2)
        # (network.py:343-344); size fields default to exactly that.
        params["flow"] = glow_lib.init_params(k_flow, glow_lib.GlowConfig(
            features=45, hidden=cfg.glow_hidden,
            num_layers=cfg.glow_layers, num_blocks=cfg.glow_blocks,
            context_features=cfg.feat_dim,
            dropout=cfg.glow_dropout))
    f, h, o = cfg.feat_dim, cfg.feat_dim, cfg.det_dims()

    def linear(key, din, dout):
        lim = (1.0 / din) ** 0.5
        kw, kb = jax.random.split(key)
        return {
            "w": jax.random.uniform(kw, (din, dout), jnp.float32, -lim, lim),
            "b": jax.random.uniform(kb, (dout,), jnp.float32, -lim, lim),
        }

    params["det_head"] = {"l0": linear(k_d0, f, h), "l1": linear(k_d1, h, o)}
    return params, batch_stats


def det_head_apply(params: dict, feat: jax.Array) -> jax.Array:
    h = jnp.dot(feat, params["l0"]["w"], precision=_PREC) + params["l0"]["b"]
    h = jax.nn.relu(h)
    return jnp.dot(h, params["l1"]["w"], precision=_PREC) + params["l1"]["b"]


def extract_feat(
    params: dict, batch_stats: dict, cfg: MHEntConfig, image: jax.Array,
    train: bool = False,
):
    """Conditioning feature = the encoder's mu head (network.py:779)."""
    _, mn, _, new_stats = encoder.apply(
        params["encoder"], batch_stats, cfg.encoder, image, key=None, train=train
    )
    return mn, new_stats


def combine_z(cfg: MHEntConfig, z_det: jax.Array, z_flow: jax.Array | None) -> jax.Array:
    """Interleave det-head dims and flow dims into the canonical z layout
    (network.py:703-717)."""
    parts = []
    p_det = 0
    for name, nd in ZDIMS:
        is_det = name != "th45" or cfg.regressor == "det"
        if is_det:
            parts.append(z_det[:, p_det : p_det + nd])
            p_det += nd
        else:
            parts.append(z_flow)
    return jnp.concatenate(parts, axis=1)


def sample_q_z(
    params: dict,
    cfg: MHEntConfig,
    feat: jax.Array,
    key: jax.Array,
    n: int,
    temp: float = 1.0,
    differentiable: bool = False,
    flow_q=None,
    pipeline=None,
):
    """Draw N hypotheses per image from q(z | I) (network.py:719-758).

    Rows are ordered as N blocks of B (hypothesis-major), matching the
    reference's `.repeat(N, 1)` layout.

    flow_q: optional flows/pallas_sampler_int8.FlowQTree — the eval
    hypothesis draw runs the W8A8 fused kernel (same base-noise key
    discipline as the other paths; inference only).

    pipeline: optional (mesh, n_micro) — run the realnvp flow draw through
    the GPipe schedule over the mesh's 'pipe' axis
    (parallel/pipeline.sample_pipelined; same base-noise key discipline,
    differentiable). Composes with TP/FSDP state shardings in
    engine.make_train_step(pipe=True).

    Returns:
        z: (N*B, 61), log_q: (N*B,) log density of the flow block (zeros in
        'det' mode).
    """
    b = feat.shape[0]
    if pipeline is not None and cfg.regressor != "realnvp":
        # Loudly, not silently: a 'pipe' mesh axis with a non-realnvp
        # regressor would otherwise run the sequential draw and let the
        # caller attribute sequential numbers to GPipe (the silent-no-op
        # class this repo keeps stamping out).
        raise NotImplementedError(
            f"pipeline parallelism covers the realnvp regressor; got "
            f"{cfg.regressor!r}"
        )
    z_flow, log_q = None, jnp.zeros(n * b)
    if cfg.regressor == "realnvp" and flow_q is not None and not differentiable:
        if pipeline is not None:
            # Same silent-no-op class as the non-realnvp guard above: the
            # int8 fused eval branch would win here and the caller would
            # attribute fused-sampler numbers to GPipe.
            raise NotImplementedError(
                "pipeline= and flow_q= are mutually exclusive: the int8 "
                "fused eval draw is not pipelined"
            )
        from mhentropy_tpu.flows import pallas_sampler_int8

        z_flow, log_q = pallas_sampler_int8.sample_fused_q(
            params["flow"], cfg.flow, flow_q, key, feat, n, temp=temp,
            return_log_prob=True,
            # The fused-sampler kill switch disables every Pallas kernel
            # path; the quantized draw still honours it by running the
            # bit-equivalent XLA emulation instead of the Mosaic kernel.
            emulate=True if cfg.use_pallas_sampler is False else None,
        )
    elif cfg.regressor == "realnvp" and pipeline is not None:
        # GPipe over the coupling stack ('pipe' mesh axis). Same base-noise
        # draw as realnvp.sample (one normal at the same key over the same
        # rows), so seeded pipelined runs ≡ the sequential scan exactly.
        from mhentropy_tpu.parallel import pipeline as pipe_lib

        p_mesh, n_micro = pipeline
        z_flow, log_q = pipe_lib.sample_pipelined(
            params["flow"], cfg.flow, key, n * b, feat, p_mesh, n_micro,
            temp=temp, n_per_image=n, return_log_prob=True,
        )
    elif cfg.regressor == "realnvp":
        # Measured row-count dispatch (see MHEntConfig.pallas_min_rows).
        use_fused = cfg.use_pallas_sampler is not False
        if use_fused and cfg.use_pallas_sampler is None:
            use_fused = (
                jax.default_backend() == "tpu"
                and cfg.flow.dim == 45
                and n * b >= cfg.pallas_min_rows
            )
        if differentiable and cfg.use_pallas_sampler is not True:
            # Under grad the custom-VJP backward re-runs the XLA forward, so
            # the kernel is strictly extra work — XLA scan unless forced.
            use_fused = False
        if use_fused and differentiable:
            from mhentropy_tpu.flows import pallas_sampler

            z_flow, log_q = pallas_sampler.sample_fused_diff(
                params["flow"], cfg.flow, key, feat, n, temp=temp,
            )
        elif use_fused:
            from mhentropy_tpu.flows import pallas_sampler

            # bf16 weights + 16-image tiles (f32 accumulation keeps log_q
            # usable for ranking). r2 honest full-pipeline A/B at B=32,
            # N=100: ipt=16 4.38 ms/step vs ipt=24 4.54; f32 weights tie
            # bf16 at ipt=16 (4.36) but bf16 keeps 2x VMEM headroom.
            small = cfg.flow.h_dim <= 512
            z_flow, log_q = pallas_sampler.sample_fused(
                params["flow"], cfg.flow, key, feat, n, temp=temp,
                return_log_prob=True,
                images_per_tile=16 if small else 8,
                weight_dtype=jnp.bfloat16 if small else jnp.float32,
            )
        else:
            cond = realnvp.make_cond(params["flow"], cfg.flow, feat)
            cproj = realnvp.cond_cache(params["flow"], cfg.flow, cond)
            cproj_n = jnp.tile(cproj, (1, 1, n, 1))  # reuse image projections
            z_flow, log_q = realnvp.sample(
                params["flow"], cfg.flow, key, n * b, cproj=cproj_n, temp=temp,
                return_log_prob=True,
            )
    elif cfg.regressor == "glow":
        from mhentropy_tpu.flows import glow as glow_lib, pallas_glow_sampler

        glow_cfg = glow_lib.infer_config(params["flow"])
        # Architectural gate lives with the kernel (structural_ok) so it
        # cannot drift from the kernel's real constraints.
        use_fused = (
            cfg.use_pallas_sampler is not False
            and not differentiable  # no custom VJP for the glow kernel
            and pallas_glow_sampler.structural_ok(glow_cfg)
        )
        if cfg.use_pallas_sampler is None:
            use_fused = use_fused and jax.default_backend() == "tpu"
        if use_fused:
            # Inference only (no dropout, no custom VJP); 1.55x on the
            # ProHMR pipeline, same kernel family (docs/PERF.md).
            from mhentropy_tpu.flows import pallas_glow_sampler

            z_flow, log_q = pallas_glow_sampler.sample_and_log_prob_fused(
                params["flow"], feat, key, n, temp=temp, cfg=glow_cfg
            )
        else:
            # Training (differentiable) applies the coupling-net dropout
            # like the torch reference's train-mode forward — infer_config
            # cannot recover the rate from params, so it rides MHEntConfig.
            z_flow, log_q = glow_lib.sample_and_log_prob(
                params["flow"], feat, key, n, temp=temp,
                cfg=glow_cfg._replace(dropout=cfg.glow_dropout),
                train=differentiable,
            )
    z_det = jnp.tile(det_head_apply(params["det_head"], feat), (n, 1))
    return combine_z(cfg, z_det, z_flow), log_q


def log_q_z(params: dict, cfg: MHEntConfig, z: jax.Array, feat_rows: jax.Array):
    """log q of the flow block of z rows (network.py:669-701)."""
    th45 = z[:, 3:48]
    if cfg.regressor == "realnvp":
        return realnvp.log_prob(params["flow"], cfg.flow, th45, feat=feat_rows)
    if cfg.regressor == "glow":
        from mhentropy_tpu.flows import glow as glow_lib

        return glow_lib.log_prob(params["flow"], th45, feat_rows)
    return jnp.zeros(z.shape[0])


def decode(
    model: ManoModel,
    cfg: MHEntConfig,
    th_bt: jax.Array,
    logs_t: jax.Array,
    mods=("uv",),
    inv_norm: bool = False,
    pallas_lbs: bool = False,
) -> dict:
    """MANO decode + normalisation + orthographic projection
    (network.py:455-558).

    Args:
        th_bt: (R, 58); logs_t: (R, 3).

    Returns:
        dict with xyz (R, K, 3) normalised-relative, verts (R, 778, 3)
        normalised-relative, uv (R, K, 2) if requested, bone (R,).
    """
    theta, beta = th_bt[:, :48], th_bt[:, -10:]
    out = mano.mano_decode(model, theta, beta, skeidx="RHD",
                           pallas_lbs=pallas_lbs)
    xyz = out["mano_joints"]  # mm (network.py:472-473)
    normed, root, bone = camera.batch_normalize_pose3d(
        xyz,
        skeletons.ROOT_IDX[cfg.ds],
        norm_idx=skeletons.NORM_IDX[cfg.ds],
        return_st=True,
    )
    result = {"xyz": normed, "bone": bone}
    result["verts"] = (out["mesh"] - root) / bone[:, None, None]
    if "uv" in mods:
        scale = jnp.exp(logs_t[:, 0:1])
        result["uv"] = camera.orth_project(
            normed, scale, logs_t[:, 1:3], cfg.image_size, inv_norm=inv_norm
        )
    if "m" in mods or "depth" in mods:
        # The mask/depth mods the reference left dead (network.py:552-557);
        # functional here via the splatting renderer.
        from mhentropy_tpu.core import render as render_lib

        result.update(render_lib.render_mods(result["verts"], logs_t, mods=mods))
    return result


def forward_log_p(
    model: ManoModel,
    cfg: MHEntConfig,
    z: jax.Array,
    y: dict,
    mods=("uv",),
) -> dict:
    """log p(y | z) + log p̃(z) per row (network.py:612-667).

    Args:
        z: (N*B, 61) hypothesis-major rows.
        y: target dict with crop_uv (B, 42), pose3d (B, 63), vis (B, 21).
    """
    pr = make_priors(cfg)
    th_bt, logs_t = z[:, :TH_BT], z[:, -3:]
    dec = decode(model, cfg, th_bt, logs_t, mods=mods, inv_norm=False)
    b = y["crop_uv"].shape[0]
    n = z.shape[0] // b
    out = {}
    for mod, gt_key, d, b_scale in (
        ("uv", "crop_uv", 2, cfg.b_2d),
        ("xyz", "pose3d", 3, cfg.b_3d),
    ):
        if mod not in mods:
            continue
        mu = dec[mod].reshape(z.shape[0], -1)
        gt = jnp.tile(y[gt_key], (n, 1))
        vis = jnp.tile(y["vis"], (n, 1))
        weights = jnp.repeat(vis, d, axis=1)
        out[f"log_p_{mod}_giv_z"] = priors.laplace_deadzone_log_prob(
            gt, mu, b_scale, weights=weights
        )
    mask_key = "hand_mask" if "hand_mask" in y else (
        "mask" if "mask" in y else None)  # HO3D vs RHD spelling
    if cfg.use_mask_loss and mask_key is not None:
        from mhentropy_tpu.core import render as render_lib

        rendered = render_lib.render_mods(dec["verts"], logs_t, mods=("m",))
        gt_mask = y[mask_key].astype(jnp.float32)
        if gt_mask.shape[-1] != rendered["mask"].shape[-1]:
            # Downsample the crop-resolution mask to the render grid.
            f = gt_mask.shape[-1] // rendered["mask"].shape[-1]
            gt_mask = gt_mask.reshape(
                gt_mask.shape[0], rendered["mask"].shape[1], f,
                rendered["mask"].shape[2], f,
            ).max((2, 4))
        gt_n = jnp.tile(gt_mask, (n, 1, 1))
        err = (rendered["mask"] - gt_n).reshape(z.shape[0], -1)
        # b_mask is the Laplace SCALE, same convention as b_2d/b_3d (the
        # reference's dead sketch passes b_init directly too,
        # network.py:394); default 0.02 = tight on a [0,1] mask error.
        out["log_p_m_giv_z"] = priors.laplace_deadzone_log_prob(
            err, jnp.zeros_like(err), cfg.b_mask
        ) / err.shape[1]  # mean-per-pixel scale
    th3, th45, bt = z[:, :3], z[:, 3:48], z[:, 48:58]
    out["log_p_th3"] = pr["th3_ref"].log_prob(th3)
    out["log_p_th45"] = pr["th45_ref"].log_prob(th45)
    out["log_p_bt"] = pr["bt"].log_prob(bt)
    out["log_p"] = sum(v for k, v in out.items() if k != "log_p") / cfg.temperature
    return out


def reverse_kld(
    model: ManoModel,
    params: dict,
    batch_stats: dict,
    cfg: MHEntConfig,
    y: dict,
    image: jax.Array,
    key: jax.Array,
    train: bool = True,
    mods=("uv",),
    pipeline=None,
) -> tuple[dict, dict]:
    """The training objective: -KL(q(z|I) || p(y|z) p̃(z)) up to a constant
    (network.py:760-831). Returns (output dict incl. per-image log_p,
    new batch stats). pipeline: see sample_q_z."""
    feat, new_stats = extract_feat(params, batch_stats, cfg, image, train=train)
    n = cfg.n_train_hypotheses
    b = feat.shape[0]
    z, log_q = sample_q_z(params, cfg, feat, key, n, temp=1.0,
                          differentiable=True, pipeline=pipeline)

    out = {}
    th_bt = z[:, :TH_BT]
    out["th_norm"] = jnp.linalg.norm(th_bt[:, :48], axis=1)
    out["bt_norm"] = jnp.linalg.norm(th_bt[:, -10:], axis=1)

    flp = forward_log_p(model, cfg, z, y, mods=mods)
    q_log_p = flp["log_p"].reshape(n, b).mean(0)
    out["q_log_p_z_giv_y"] = q_log_p

    log_p = q_log_p
    if cfg.entropy:
        h = (-log_q).reshape(n, b).mean(0)
        out["h_q_z_giv_i"] = h
        log_p = log_p + h

    if cfg.use_chamfer_loss:
        # Hand-object chamfer penalty (network.py:821-826).
        from mhentropy_tpu.train import metrics as metrics_lib

        dec = decode(model, cfg, th_bt, z[:, -3:], mods=())
        xyz_nb = dec["xyz"].reshape(n, b, -1, 3)
        chamfer = metrics_lib.chamfer_dist(xyz_nb, y).mean(0)
        out["chamfer"] = chamfer
        log_p = log_p - cfg.w_chamfer * chamfer

    out["log_p"] = log_p
    return out, new_stats


def sample_hypotheses(
    model: ManoModel,
    params: dict,
    batch_stats: dict,
    cfg: MHEntConfig,
    image: jax.Array,
    key: jax.Array,
    n: int = 200,
    n_quant: int | None = None,
    temp: float = 0.8,
    mods=("xyz", "uv", "verts"),
    quant=None,
) -> dict:
    """Multi-hypothesis inference (network.py:846-883).

    Returns dict with th_bt / logs_t (N', B, .), xyz (N', B, 63),
    uv (N', B, 42) in pixel space, verts (N', B, 2334), faces.

    quant: optional (QuantSpec, qtree) from models/quant.py — runs the
    conditioning encoder through the int8 W8A8 path (serving option).
    When the spec sets int8_sampler and the qtree carries a "flow"
    FlowQTree, the hypothesis draw also runs the int8 fused sampler.
    """
    flow_q = None
    if quant is not None:
        from mhentropy_tpu.models import quant as quant_mod

        feat = quant_mod.encoder_feat(
            quant[0], quant[1], params["encoder"], image)
        if getattr(quant[0], "int8_sampler", False):
            flow_q = quant[1].get("flow")
            if flow_q is None:
                raise ValueError(
                    "QuantSpec.int8_sampler is set but the qtree carries "
                    "no 'flow' FlowQTree — calibrate one with "
                    "models/quant.quantize_sampler_into (running the "
                    "float sampler silently would invalidate any int8 A/B)"
                )
    else:
        feat, _ = extract_feat(params, batch_stats, cfg, image, train=False)
    b = image.shape[0]
    z, log_q = sample_q_z(params, cfg, feat, key, n, temp=temp,
                          flow_q=flow_q)
    z = z.reshape(n, b, Z_TOTAL)
    if n_quant is not None and n_quant < n:
        # Keep the n_quant most likely hypotheses per image (network.py:866-871).
        lq = log_q.reshape(n, b)
        _, idx = jax.lax.top_k(lq.T, n_quant)  # (B, Q)
        z = jnp.take_along_axis(z, idx.T[:, :, None], axis=0)
        n = n_quant
    out = {"th_bt": z[..., :TH_BT], "logs_t": z[..., -3:]}
    from mhentropy_tpu.core import lbs_pallas

    dec = decode(
        model, cfg,
        z.reshape(n * b, Z_TOTAL)[:, :TH_BT],
        z.reshape(n * b, Z_TOTAL)[:, -3:],
        mods=mods, inv_norm=True,
        # Fused LBS blend on TPU (inference-only; the train path's decode
        # keeps the autodiff-clean einsums).
        pallas_lbs=lbs_pallas.supported(n * b, model.lbs_weights.shape[0]),
    )
    for mod in ("verts", "xyz", "uv"):
        if mod in mods:
            out[mod] = dec[mod].reshape(n, b, -1)
    if "verts" in mods:
        out["faces"] = model.faces
    return out


def kld_weight(cfg: MHEntConfig, step) -> jax.Array:
    """Linear KLD-weight annealing (network.py:885-887)."""
    w0, steps = cfg.kld_w_annealing
    frac = jnp.minimum(1.0, step / steps)
    return w0 + (cfg.kld_w - w0) * frac


def sample_p_z(cfg: MHEntConfig, key: jax.Array, n: int, b: int, **means) -> jax.Array:
    """Ancestral sampling from the z-priors (network.py:574-599): each z block
    draws from its reference prior when one exists, else N(0, 1); passing
    `<name>_mean` arrays instead perturbs those means by 0.3 x their batch
    std."""
    pr = make_priors(cfg)
    rows = n * b
    parts = []
    for name, nd in ZDIMS:
        key, k = jax.random.split(key)
        if f"{name}_mean" in means:
            mean = means[f"{name}_mean"]
            std = mean.std(0)
            parts.append(mean + jax.random.normal(k, mean.shape) * std * 0.3)
        elif f"{name}_ref" in pr:
            sampler = pr[f"{name}_ref"]
            shape = (rows,) if sampler.sup == "ball" else (rows, nd)
            parts.append(sampler.sample(k, shape).reshape(rows, nd))
        elif name in pr:
            parts.append(pr[name].sample(k, (rows, nd)))
        else:
            parts.append(jax.random.normal(k, (rows, nd)))
    return jnp.concatenate(parts, axis=1)


def evidence_from_target(y: dict, use_gt, n: int) -> dict:
    """GT evidence blocks for ancestral conditioning (network.py:601-610):
    'bt' -> zeros, 'logs'/'t' -> from the fitted orthographic camera."""
    ev = {}
    b = y["st"].shape[0]
    if "bt" in use_gt:
        ev["bt"] = jnp.zeros((n * b, 10))
    st = jnp.tile(y["st"], (n, 1))
    if "logs" in use_gt:
        ev["logs"] = jnp.log(st[:, 0:1])
    if "t" in use_gt:
        ev["t"] = st[:, 1:3]
    return ev


def set_evidences(z: jax.Array, evidences: dict | None) -> jax.Array:
    """Overwrite z blocks with GT evidence (network.py:560-572)."""
    if not evidences:
        return z
    if "bt" in evidences:
        z = z.at[:, 48:58].set(evidences["bt"])
    if "logs" in evidences:
        z = z.at[:, 58:59].set(evidences["logs"])
    if "t" in evidences:
        z = z.at[:, 59:61].set(evidences["t"])
    return z
