"""ConditionalGlow, bit-compatible with the nkolot/nflows fork the reference
imports (/root/reference/hand/network.py:20,343-344, CrossModalHand.py:101-104,
dep pinned at hand/environment.yml:284) and ProHMR's released SMPL flows
(/root/reference/README.md:26-42).

Per step (nflows 'forward' = data -> noise):
  1. ActNorm: y = exp(log_scale) * x + shift, with data-dependent init
     semantics exposed as `ddi()` (nflows transforms/normalization.py).
  2. LULinear: y = x @ (L U)^T + bias, L unit-lower-triangular, U upper with
     diag = softplus(unconstrained) + eps (nflows transforms/lu.py).
  3. AffineCouplingTransform with the alternating mask (mask[::2] = -1,
     flipped each step): identity split drives a context-conditioned
     ResidualNet producing (shift, unconstrained_scale);
     scale = sigmoid(unconstrained_scale + 2) + 1e-3
     (nflows transforms/coupling.py).
The coupling transform-net is nflows.nn.nets.ResidualNet: initial Linear on
[x_id, context], `num_blocks` residual blocks (two Linears, optional
BatchNorm1d(eps=1e-3), dropout, GLU context gating), final Linear — matching
parameter-for-parameter so released fork checkpoints load bit-exactly via
tools/convert_torch.convert_conditional_glow.

TPU-first: context projections (initial-layer context slice + every block's
context_layer) are computed once per image and broadcast across hypotheses;
all contractions run at HIGH precision (3-pass f32-accurate); layers unroll (L<=4) into one
fused XLA program.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mhentropy_tpu.flows.priors import std_normal_logp as _std_normal_logp

_PREC = jax.lax.Precision.HIGH


class GlowConfig(NamedTuple):
    features: int = 45
    hidden: int = 512
    num_layers: int = 4
    num_blocks: int = 2
    context_features: int = 512
    dropout: float = 0.0  # dropout_probability (0.2 for the MHEnt glow)
    use_batch_norm: bool = False  # batch_norm_within_layers (p_nf glow mode)


def coupling_masks(features: int, num_layers: int) -> list[tuple[np.ndarray, np.ndarray]]:
    """(identity_features, transform_features) per step.

    nflows ConditionalGlow: mask = ones(features); mask[::2] = -1; identity =
    indices with mask <= 0, flipped (mask *= -1) after every step.
    """
    mask = np.ones(features)
    mask[::2] = -1
    out = []
    for _ in range(num_layers):
        idx = np.arange(features)
        out.append((idx[mask <= 0], idx[mask > 0]))
        mask = -mask
    return out


def _linear_init(key, din, dout):
    """torch.nn.Linear default init (U(-1/sqrt(fan_in), ..))."""
    lim = 1.0 / math.sqrt(din)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (din, dout), jnp.float32, -lim, lim),
        "b": jax.random.uniform(kb, (dout,), jnp.float32, -lim, lim),
    }


def init_params(key: jax.Array, cfg: GlowConfig) -> list[dict]:
    """List of per-step param dicts {actnorm, linear, coupling}; shapes and
    init match the torch fork (actnorm zeros pre-DDI, LULinear identity_init,
    ResidualNet torch-default Linears with the zero-init last block linear)."""
    d, h, c = cfg.features, cfg.hidden, cfg.context_features
    n_tri = (d - 1) * d // 2
    masks = coupling_masks(d, cfg.num_layers)
    layers = []
    for i in range(cfg.num_layers):
        key, k_init, k_final = jax.random.split(key, 3)
        ni = len(masks[i][0])
        nt = len(masks[i][1])
        blocks = []
        for _ in range(cfg.num_blocks):
            key, k0, k1, kc, kz = jax.random.split(key, 5)
            blk = {
                "l0": _linear_init(k0, h, h),
                # nflows ResidualBlock zero_initialization: last linear
                # U(-1e-3, 1e-3).
                "l1": {
                    "w": jax.random.uniform(kz, (h, h), jnp.float32, -1e-3, 1e-3),
                    "b": jax.random.uniform(k1, (h,), jnp.float32, -1e-3, 1e-3),
                },
                "ctx": _linear_init(kc, c, h),
            }
            if cfg.use_batch_norm:
                blk["bn0"] = {"scale": jnp.ones(h), "bias": jnp.zeros(h),
                              "mean": jnp.zeros(h), "var": jnp.ones(h)}
                blk["bn1"] = {"scale": jnp.ones(h), "bias": jnp.zeros(h),
                              "mean": jnp.zeros(h), "var": jnp.ones(h)}
            blocks.append(blk)
        layers.append({
            "actnorm": {"log_scale": jnp.zeros(d), "shift": jnp.zeros(d)},
            "linear": {
                "lower_entries": jnp.zeros(n_tri),
                "upper_entries": jnp.zeros(n_tri),
                # identity_init: softplus(x) + eps == 1.
                "unconstrained_upper_diag": jnp.full(
                    d, math.log(math.exp(1.0 - 1e-3) - 1.0)
                ),
                "bias": jnp.zeros(d),
            },
            "coupling": {
                "initial": _linear_init(k_init, ni + c, h),
                "blocks": blocks,
                "final": _linear_init(k_final, h, 2 * nt),
            },
        })
    return layers


def infer_config(params: list[dict]) -> GlowConfig:
    l0 = params[0]
    d = l0["actnorm"]["log_scale"].shape[0]
    h = l0["coupling"]["final"]["w"].shape[0]
    blocks = l0["coupling"]["blocks"]
    c = blocks[0]["ctx"]["w"].shape[0]
    return GlowConfig(
        features=d, hidden=h, num_layers=len(params),
        num_blocks=len(blocks), context_features=c,
        use_batch_norm="bn0" in blocks[0],
    )


def _lu_weight(lin: dict, eps: float = 1e-3):
    """(W = L @ U, log|det W|) from the LU parametrization."""
    d = lin["bias"].shape[0]
    li = np.tril_indices(d, k=-1)
    ui = np.triu_indices(d, k=1)
    diag = jax.nn.softplus(lin["unconstrained_upper_diag"]) + eps
    lower = jnp.eye(d).at[li].set(lin["lower_entries"])
    upper = jnp.zeros((d, d)).at[ui].set(lin["upper_entries"])
    upper = upper.at[np.diag_indices(d)].set(diag)
    w = jnp.dot(lower, upper, precision=_PREC)
    return w, jnp.sum(jnp.log(diag))


def _batch_norm(bn: dict, x: jax.Array, train: bool, eps: float = 1e-3):
    """torch BatchNorm1d(eps=1e-3) — batch stats in train, running in eval."""
    if train:
        mean = x.mean(0)
        var = x.var(0)
    else:
        mean, var = bn["mean"], bn["var"]
    return (x - mean) * jax.lax.rsqrt(var + eps) * bn["scale"] + bn["bias"]


def _residual_net(
    coupling: dict,
    x_id: jax.Array,
    ctx_cache: dict,
    train: bool = False,
    key: jax.Array | None = None,
    dropout: float = 0.0,
):
    """nflows.nn.nets.ResidualNet forward, context projections pre-cached.

    initial: Linear([x, ctx]); block: (bn) relu lin0 (bn) relu drop lin1,
    GLU gate by context_layer(ctx), residual add; final Linear.
    """
    ni = x_id.shape[-1]
    w_in = coupling["initial"]["w"]
    temps = (
        jnp.dot(x_id, w_in[:ni], precision=_PREC)
        + ctx_cache["initial"]
        + coupling["initial"]["b"]
    )
    for k, blk in enumerate(coupling["blocks"]):
        t = temps
        if "bn0" in blk:
            t = _batch_norm(blk["bn0"], t, train)
        t = jax.nn.relu(t)
        t = jnp.dot(t, blk["l0"]["w"], precision=_PREC) + blk["l0"]["b"]
        if "bn1" in blk:
            t = _batch_norm(blk["bn1"], t, train)
        t = jax.nn.relu(t)
        if train and dropout > 0.0 and key is not None:
            key, kd = jax.random.split(key)
            keep = jax.random.bernoulli(kd, 1.0 - dropout, t.shape)
            t = jnp.where(keep, t / (1.0 - dropout), 0.0)
        t = jnp.dot(t, blk["l1"]["w"], precision=_PREC) + blk["l1"]["b"]
        # F.glu(cat(t, ctx_proj)): gate by sigmoid of the context projection.
        t = t * jax.nn.sigmoid(ctx_cache["blocks"][k])
        temps = temps + t
    return jnp.dot(temps, coupling["final"]["w"], precision=_PREC) + coupling[
        "final"
    ]["b"]


def _ctx_cache(params: list[dict], context: jax.Array) -> list[dict]:
    """Per-image context projections, computed once and broadcast across
    hypotheses: the initial layer's context slice and every block's
    context_layer output, for each step."""
    out = []
    for layer in params:
        cpl = layer["coupling"]
        ni = cpl["initial"]["w"].shape[0] - context.shape[-1]
        entry = {
            "initial": jnp.dot(
                context, cpl["initial"]["w"][ni:], precision=_PREC
            ),
            "blocks": [
                jnp.dot(context, blk["ctx"]["w"], precision=_PREC)
                + blk["ctx"]["b"]
                for blk in cpl["blocks"]
            ],
        }
        out.append(entry)
    return out


def _tile_cache(cache: list[dict], n: int) -> list[dict]:
    return jax.tree_util.tree_map(lambda x: jnp.tile(x, (n, 1)), cache)


def _scale_shift(cpl_out: jax.Array, nt: int):
    shift = cpl_out[:, :nt]
    scale = jax.nn.sigmoid(cpl_out[:, nt:] + 2.0) + 1e-3
    return scale, shift


def inverse(
    params: list[dict],
    cfg: GlowConfig,
    x: jax.Array,
    ctx_cache: list[dict],
    train: bool = False,
    key: jax.Array | None = None,
):
    """data -> base (the nflows transform 'forward'), with log|det dz/dx|."""
    logdet = jnp.zeros(x.shape[0], x.dtype)
    masks = coupling_masks(cfg.features, cfg.num_layers)
    for i, layer in enumerate(params):
        an = layer["actnorm"]
        x = x * jnp.exp(an["log_scale"]) + an["shift"]
        logdet = logdet + jnp.sum(an["log_scale"])
        w, ld_w = _lu_weight(layer["linear"])
        x = jnp.dot(x, w.T, precision=_PREC) + layer["linear"]["bias"]
        logdet = logdet + ld_w
        id_idx, tr_idx = masks[i]
        x_id, x_tr = x[:, id_idx], x[:, tr_idx]
        if key is not None:
            key, k_net = jax.random.split(key)
        else:
            k_net = None
        cpl_out = _residual_net(
            layer["coupling"], x_id, ctx_cache[i], train, k_net, cfg.dropout
        )
        scale, shift = _scale_shift(cpl_out, len(tr_idx))
        x_tr = x_tr * scale + shift
        logdet = logdet + jnp.sum(jnp.log(scale), axis=1)
        x = jnp.zeros_like(x).at[:, id_idx].set(x_id).at[:, tr_idx].set(x_tr)
    return x, logdet


def forward(
    params: list[dict],
    cfg: GlowConfig,
    z: jax.Array,
    ctx_cache: list[dict],
    train: bool = False,
    key: jax.Array | None = None,
):
    """base -> data (the nflows transform 'inverse'), with log|det dx/dz|."""
    logdet = jnp.zeros(z.shape[0], z.dtype)
    masks = coupling_masks(cfg.features, cfg.num_layers)
    for i in reversed(range(len(params))):
        layer = params[i]
        id_idx, tr_idx = masks[i]
        z_id, z_tr = z[:, id_idx], z[:, tr_idx]
        if key is not None:
            key, k_net = jax.random.split(key)
        else:
            k_net = None
        cpl_out = _residual_net(
            layer["coupling"], z_id, ctx_cache[i], train, k_net, cfg.dropout
        )
        scale, shift = _scale_shift(cpl_out, len(tr_idx))
        z_tr = (z_tr - shift) / scale
        logdet = logdet - jnp.sum(jnp.log(scale), axis=1)
        z = jnp.zeros_like(z).at[:, id_idx].set(z_id).at[:, tr_idx].set(z_tr)
        w, ld_w = _lu_weight(layer["linear"])
        # Invert the small DxD once; rows then ride one MXU matmul.
        w_inv = jnp.linalg.inv(w)
        z = jnp.dot(z - layer["linear"]["bias"], w_inv.T, precision=_PREC)
        logdet = logdet - ld_w
        an = layer["actnorm"]
        z = (z - an["shift"]) * jnp.exp(-an["log_scale"])
        logdet = logdet - jnp.sum(an["log_scale"])
    return z, logdet


def _require_cfg_for_train(cfg, train: bool) -> None:
    """train=True needs an explicit GlowConfig: `infer_config` cannot
    recover the dropout rate from params (it returns dropout=0.0), so a
    train-mode call without cfg would silently skip coupling-net dropout —
    the exact 'configured but never applied' defect class fixed once
    already in models/mhent.py (which passes its stored cfg)."""
    if train and cfg is None:
        raise ValueError(
            "glow train-mode call without an explicit GlowConfig: the "
            "dropout rate is not recoverable from params (infer_config "
            "returns dropout=0.0) — pass the cfg the params were built with"
        )


def log_prob(
    params: list[dict],
    x: jax.Array,
    context: jax.Array,
    cfg: GlowConfig | None = None,
    train: bool = False,
    key: jax.Array | None = None,
) -> jax.Array:
    """log q(x | context); context rows aligned with x rows (the fork's
    Flow.log_prob up to its extra returned noise)."""
    _require_cfg_for_train(cfg, train)
    cfg = cfg or infer_config(params)
    cache = _ctx_cache(params, context)
    z, logdet = inverse(params, cfg, x, cache, train=train, key=key)
    return _std_normal_logp(z) + logdet


def sample_and_log_prob(
    params: list[dict],
    context: jax.Array,
    key: jax.Array,
    n: int,
    temp: float = 1.0,
    cfg: GlowConfig | None = None,
    noise: jax.Array | None = None,
    train: bool = False,
):
    """Draw n hypotheses per context row, hypothesis-major (n*B, D), with
    their log density from the same pass (network.py:736-742: externally
    scaled base noise, log_prob = base logp(noise) - log|det dx/dz|)."""
    _require_cfg_for_train(cfg, train)
    b = context.shape[0]
    cfg = cfg or infer_config(params)
    cache = _tile_cache(_ctx_cache(params, context), n)
    if noise is None:
        key, k_noise = jax.random.split(key)
        noise = jax.random.normal(k_noise, (n * b, cfg.features)) * temp
    x, logdet = forward(params, cfg, noise, cache, train=train,
                        key=key if train else None)
    return x, _std_normal_logp(noise) - logdet


def ddi(
    params: list[dict],
    cfg: GlowConfig,
    x: jax.Array,
    context: jax.Array,
) -> list[dict]:
    """ActNorm data-dependent init, matching the fork's first training-mode
    forward (nflows ActNorm._initialize): per step, log_scale = -log(std),
    shift = -(x/std).mean(0) of that step's actnorm input, then the step is
    applied with the new values before initialising the next.

    Known limitations: (a) use_batch_norm=True — the propagation here
    runs the coupling nets in EVAL mode (initial running stats), while
    the fork's first train-mode forward would normalise with batch
    statistics and update the running stats as a side effect — actnorms
    after step 0 initialise from a slightly different activation
    distribution on BN configs; (b) dropout>0 — the fork's first
    train-mode forward applies coupling-net dropout, so its actnorms
    after step 0 initialise from dropout-perturbed activations, while
    this propagation is deterministic (dropout-free). Both are
    deliberate: DDI from deterministic statistics is reproducible. The
    shipped glow configs use use_batch_norm=False, where (a) is exact
    (tests/test_glow_parity_torch.py::test_actnorm_ddi_parity); (b)
    only shifts the *initialisation*, not the converged model."""
    masks = coupling_masks(cfg.features, cfg.num_layers)
    cache = _ctx_cache(params, context)
    new_params = []
    for i, layer in enumerate(params):
        std = jnp.std(x, axis=0, ddof=1)  # torch.std default: unbiased
        log_scale = -jnp.log(std)
        shift = -(x / std).mean(0)
        layer = dict(layer)
        layer["actnorm"] = {"log_scale": log_scale, "shift": shift}
        new_params.append(layer)
        x = x * jnp.exp(log_scale) + shift
        w, _ = _lu_weight(layer["linear"])
        x = jnp.dot(x, w.T, precision=_PREC) + layer["linear"]["bias"]
        id_idx, tr_idx = masks[i]
        x_id, x_tr = x[:, id_idx], x[:, tr_idx]
        cpl_out = _residual_net(layer["coupling"], x_id, cache[i])
        scale, shift_c = _scale_shift(cpl_out, len(tr_idx))
        x_tr = x_tr * scale + shift_c
        x = jnp.zeros_like(x).at[:, id_idx].set(x_id).at[:, tr_idx].set(x_tr)
    return new_params


def bn_stats_update(
    params: list[dict],
    cfg: GlowConfig,
    x: jax.Array,
    context: jax.Array,
    momentum: float = 0.1,
) -> list[dict]:
    """Refresh coupling-net BatchNorm running stats from one data batch
    (torch updates them on every training forward; here it is an explicit
    host-side pass, use_batch_norm configs only)."""
    if not cfg.use_batch_norm:
        return params
    masks = coupling_masks(cfg.features, cfg.num_layers)
    cache = _ctx_cache(params, context)
    new_params = []
    for i, layer in enumerate(params):
        an = layer["actnorm"]
        x = x * jnp.exp(an["log_scale"]) + an["shift"]
        w, _ = _lu_weight(layer["linear"])
        x = jnp.dot(x, w.T, precision=_PREC) + layer["linear"]["bias"]
        id_idx, tr_idx = masks[i]
        x_id, x_tr = x[:, id_idx], x[:, tr_idx]
        # Walk the residual net, recording each BN input's batch stats.
        cpl = layer["coupling"]
        ni = x_id.shape[-1]
        temps = (
            jnp.dot(x_id, cpl["initial"]["w"][:ni], precision=_PREC)
            + cache[i]["initial"] + cpl["initial"]["b"]
        )
        new_blocks = []
        for k, blk in enumerate(cpl["blocks"]):
            blk = dict(blk)
            t = temps
            if "bn0" in blk:
                blk["bn0"] = _bn_update(blk["bn0"], t, momentum)
                t = _batch_norm(blk["bn0"], t, train=True)
            t = jax.nn.relu(t)
            t = jnp.dot(t, blk["l0"]["w"], precision=_PREC) + blk["l0"]["b"]
            if "bn1" in blk:
                blk["bn1"] = _bn_update(blk["bn1"], t, momentum)
                t = _batch_norm(blk["bn1"], t, train=True)
            t = jax.nn.relu(t)
            t = jnp.dot(t, blk["l1"]["w"], precision=_PREC) + blk["l1"]["b"]
            t = t * jax.nn.sigmoid(cache[i]["blocks"][k])
            temps = temps + t
            new_blocks.append(blk)
        cpl = dict(cpl)
        cpl["blocks"] = new_blocks
        layer = dict(layer)
        layer["coupling"] = cpl
        new_params.append(layer)
        cpl_out = jnp.dot(temps, cpl["final"]["w"], precision=_PREC) + cpl[
            "final"
        ]["b"]
        scale, shift = _scale_shift(cpl_out, len(tr_idx))
        x_tr = x_tr * scale + shift
        x = jnp.zeros_like(x).at[:, id_idx].set(x_id).at[:, tr_idx].set(x_tr)
    return new_params


def _bn_update(bn: dict, x: jax.Array, momentum: float) -> dict:
    n = x.shape[0]
    var_unbiased = x.var(0) * n / max(n - 1, 1)
    return {
        "scale": bn["scale"], "bias": bn["bias"],
        "mean": (1 - momentum) * bn["mean"] + momentum * x.mean(0),
        "var": (1 - momentum) * bn["var"] + momentum * var_unbiased,
    }
