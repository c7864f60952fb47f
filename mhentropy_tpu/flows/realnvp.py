"""Conditional RealNVP coupling flow, TPU-first.

Capability parity with the reference flow (/root/reference/hand/flows.py:
125-362): alternating-half-mask affine couplings, 3-layer MLP s/t nets with
tanh on s, per-layer 'sum' fusion of a learned projection of the conditioning
feature, standard-normal base, visibility-weighted log_prob, temperature
sampling, per-joint independent modelling (dim in {2,3}) with an optional
DDPM-style joint-index embedding, and actnorm-style 'x'/'z' transforms
(RLE mode).

TPU-first design decisions (none of this mirrors the torch module structure):

* All L coupling layers are stacked into single weight tensors with a leading
  layer axis and traversed with `lax.scan` — one compiled loop body instead of
  L unrolled python modules.
* The conditioning projections (the dominant FLOPs: cond_dim x hidden per
  layer per net per fusion point) depend only on the per-image feature, so
  they are precomputed ONCE per image into a (L, 4, B, H) cache and reused
  across all N hypotheses — the reference recomputes them for every
  hypothesis via `.repeat(N, 1)` (network.py:734).
* `sample_and_log_prob` accumulates the log-determinant during the forward
  pass, so the entropy term needs no second inverse pass (the reference runs
  a full backward_p over the samples, network.py:801).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mhentropy_tpu.flows.priors import std_normal_logp as _std_normal_logp

# The 61-dim flow is parity-critical (log_prob must match the reference to
# 1e-4): run its contractions at full f32 rather than the bf16 MXU default.
_PREC = jax.lax.Precision.HIGH


class RealNVPConfig(NamedTuple):
    dim: int = 45
    cond_dim: int = 0  # 0 => unconditional; matches tsfm_on=int
    h_dim: int = 512  # reference uses equal h_dims=[h, h]
    num_steps: int = 6  # pairs of coupling layers => L = 2*num_steps
    joint_n: int = 21  # for per-joint modelling when dim in {2, 3}
    kemb: bool = False  # DDPM joint-index embedding (dim in {2,3} only)
    tsfm_on: str | None = None  # None | 'x' | 'z' (actnorm modes); cond via cond_dim
    # Joint-feature partitioner (flows.py:179-185): tuple of (in_f, out_f);
    # each maps feat[:, :in_f] -> (B, joint_n, out_f / joint_n), concatenated.
    cond_mapping_dims: tuple = ()

    @property
    def n_layers(self) -> int:
        return 2 * self.num_steps

    def kemb_ch(self) -> int:
        return 63

    def effective_cond_dim(self) -> int:
        c = self.cond_dim
        if self.kemb:
            ch = self.kemb_ch()
            if ch != c:
                c += ch  # concat fusion (flows.py:175-176)
        return c


class RealNVPParams(NamedTuple):
    """Stacked per-layer weights. Leading axis = coupling layer.

    Each of the s/t nets is: h = W0 x + b0 (+ C0 c) ; h = lrelu(h);
    h = W1 h + b1 (+ C1 c); h = lrelu(h); y = W2 h + b2; s-net applies tanh.
    """

    masks: jax.Array  # (L, D) {0,1}
    s_w0: jax.Array  # (L, D, H)
    s_b0: jax.Array  # (L, H)
    s_w1: jax.Array  # (L, H, H)
    s_b1: jax.Array  # (L, H)
    s_w2: jax.Array  # (L, H, D)
    s_b2: jax.Array  # (L, D)
    t_w0: jax.Array
    t_b0: jax.Array
    t_w1: jax.Array
    t_b1: jax.Array
    t_w2: jax.Array
    t_b2: jax.Array
    # Conditional projections (None when unconditional).
    s_c0: jax.Array | None  # (L, C, H)
    s_cb0: jax.Array  # (L, H)
    s_c1: jax.Array
    s_cb1: jax.Array
    t_c0: jax.Array
    t_cb0: jax.Array
    t_c1: jax.Array
    t_cb1: jax.Array
    # kemb MLP (joint-index embedding), None when disabled (orbax refuses
    # zero-size arrays — absent param fields are always None in this repo).
    kemb_w0: jax.Array
    kemb_b0: jax.Array
    kemb_w1: jax.Array
    kemb_b1: jax.Array
    # Joint-feature partitioner linears, one (w, b) per cond_mapping_dims entry.
    part_ws: tuple
    part_bs: tuple


def default_masks(dim: int, num_steps: int) -> np.ndarray:
    """Alternating half masks [A, B] * num_steps (flows.py:153-155)."""
    a = np.array([0] * (dim // 2) + [1] * (dim - dim // 2), np.float32)
    return np.stack([a, 1.0 - a] * num_steps)


def _xavier(key, shape, gain=1.0):
    fan_in, fan_out = shape[-2], shape[-1]
    bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_params(key: jax.Array, cfg: RealNVPConfig) -> RealNVPParams:
    """Xavier(gain=0.01) weights + zero biases so the flow starts near
    the identity. NOT reference parity: the reference's _init()
    (flows.py:200-208) is dead code (no call site), so it actually
    trains from torch-default kaiming weights + nonzero uniform biases;
    near-identity is the deliberate, better-behaved choice here (copied-
    weight parity tests are unaffected)."""
    d, h, c, L = cfg.dim, cfg.h_dim, cfg.effective_cond_dim(), cfg.n_layers
    keys = iter(jax.random.split(key, 32))

    def lin(shape):
        return _xavier(next(keys), (L, *shape), gain=0.01)

    zeros = lambda *s: jnp.zeros((L, *s), jnp.float32)
    kd = cfg.kemb_ch() if cfg.kemb else 0
    k0, k1 = jax.random.split(next(keys))
    return RealNVPParams(
        masks=jnp.asarray(default_masks(d, cfg.num_steps)),
        s_w0=lin((d, h)), s_b0=zeros(h),
        s_w1=lin((h, h)), s_b1=zeros(h),
        s_w2=lin((h, d)), s_b2=zeros(d),
        t_w0=lin((d, h)), t_b0=zeros(h),
        t_w1=lin((h, h)), t_b1=zeros(h),
        t_w2=lin((h, d)), t_b2=zeros(d),
        s_c0=lin((c, h)) if c else None,
        s_cb0=zeros(h) if c else None,
        s_c1=lin((c, h)) if c else None,
        s_cb1=zeros(h) if c else None,
        t_c0=lin((c, h)) if c else None,
        t_cb0=zeros(h) if c else None,
        t_c1=lin((c, h)) if c else None,
        t_cb1=zeros(h) if c else None,
        kemb_w0=_xavier(k0, (kd, kd)) if kd else None,
        kemb_b0=jnp.zeros((kd,)) if kd else None,
        kemb_w1=_xavier(k1, (kd, kd)) if kd else None,
        kemb_b1=jnp.zeros((kd,)) if kd else None,
        part_ws=tuple(
            _xavier(k, (in_f, out_f))
            for k, (in_f, out_f) in zip(
                jax.random.split(next(keys), max(1, len(cfg.cond_mapping_dims))),
                cfg.cond_mapping_dims,
            )
        ),
        part_bs=tuple(jnp.zeros((out_f,)) for _, out_f in cfg.cond_mapping_dims),
    )


def timestep_embedding(timesteps: jax.Array, embedding_dim: int) -> jax.Array:
    """Sinusoidal embedding (flows.py:10-28, tensor2tensor convention)."""
    half = embedding_dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * -(math.log(10000.0) / (half - 1))
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def make_cond(params: RealNVPParams, cfg: RealNVPConfig, feat: jax.Array) -> jax.Array:
    """Conditioning tensor per flow row (flows.py:229-269).

    For joint-wise modelling (dim in {2,3}) each image feature is shared by
    all joint_n rows, optionally fused with a learned joint-index embedding.

    Args:
        feat: (B, F).

    Returns:
        (B, C) or (B * joint_n, C).
    """
    if cfg.dim in (2, 3):
        b = feat.shape[0]
        if cfg.kemb:
            # 2.2: shared image feature + joint-index embedding
            # (flows.py:247-257).
            cond = jnp.repeat(feat, cfg.joint_n, axis=0)
            ch = cfg.kemb_ch()
            idx = jnp.tile(jnp.arange(cfg.joint_n), b)
            k = timestep_embedding(idx, ch)
            k = jax.nn.relu(k @ params.kemb_w0 + params.kemb_b0)
            k = k @ params.kemb_w1 + params.kemb_b1
            if cond.shape[1] == k.shape[1]:
                cond = cond + k
            else:
                cond = jnp.concatenate([cond, k], axis=1)
            return cond
        if params.part_ws:
            # 2.1 with partitioner: each linear reads the leading in_f slice
            # of feat (flows.py:259-268 keeps its read pointer at 0).
            joint_feats = [
                (feat[:, : w.shape[0]] @ w + bias).reshape(b, cfg.joint_n, -1)
                for w, bias in zip(params.part_ws, params.part_bs)
            ]
            feat = jnp.concatenate(joint_feats, axis=-1)
        # Per-joint rows take contiguous feature chunks (flows.py:268).
        return feat.reshape(b * cfg.joint_n, -1)
    return feat


def cond_cache(params: RealNVPParams, cfg: RealNVPConfig, cond: jax.Array) -> jax.Array:
    """Precompute per-layer conditioning projections once per image.

    Args:
        cond: (B, C) output of `make_cond`.

    Returns:
        (L, 4, B, H): layer x (s0, s1, t0, t1) x batch x hidden. For an
        unconditional flow the cache is never read (`_st_nets` skips the
        adds), so the placeholder is a broadcastable (L, 4, B, 1) zeros —
        the same shape forward/inverse build for cproj=None — instead of
        a full (L, 4, B, H) allocation.
    """
    if cfg.effective_cond_dim() == 0:
        return jnp.zeros((cfg.n_layers, 4, cond.shape[0], 1))
    proj = jnp.stack(
        [
            jnp.einsum("bc,lch->lbh", cond, params.s_c0, precision=_PREC)
            + params.s_cb0[:, None],
            jnp.einsum("bc,lch->lbh", cond, params.s_c1, precision=_PREC)
            + params.s_cb1[:, None],
            jnp.einsum("bc,lch->lbh", cond, params.t_c0, precision=_PREC)
            + params.t_cb0[:, None],
            jnp.einsum("bc,lch->lbh", cond, params.t_c1, precision=_PREC)
            + params.t_cb1[:, None],
        ],
        axis=1,
    )
    return proj


def _st_nets(layer, x_masked, cproj, conditional: bool):
    """Evaluate the s and t MLPs for one coupling layer.

    Args:
        layer: pytree of this layer's weights (leading L axis already indexed).
        x_masked: (R, D) masked input rows.
        cproj: (4, R, H) conditioning projections for this layer (s0,s1,t0,t1).
    """
    def mlp(w0, b0, w1, b1, w2, b2, c0, c1, squash):
        h = jnp.dot(x_masked, w0, precision=_PREC) + b0
        if conditional:
            h = h + c0
        h = jax.nn.leaky_relu(h, 0.01)
        h = jnp.dot(h, w1, precision=_PREC) + b1
        if conditional:
            h = h + c1
        h = jax.nn.leaky_relu(h, 0.01)
        out = jnp.dot(h, w2, precision=_PREC) + b2
        return jnp.tanh(out) if squash else out

    s = mlp(layer.s_w0, layer.s_b0, layer.s_w1, layer.s_b1, layer.s_w2,
            layer.s_b2, cproj[0], cproj[1], True)
    t = mlp(layer.t_w0, layer.t_b0, layer.t_w1, layer.t_b1, layer.t_w2,
            layer.t_b2, cproj[2], cproj[3], False)
    return s, t


def _layer_tree(params: RealNVPParams):
    """Per-layer weight pytree (everything with a leading L axis)."""
    return params._replace(
        kemb_w0=None, kemb_b0=None, kemb_w1=None, kemb_b1=None,
        part_ws=None, part_bs=None,
    )


def forward(
    params: RealNVPParams,
    cfg: RealNVPConfig,
    z: jax.Array,
    cproj: jax.Array | None = None,
):
    """Base -> data through the coupling stack (flows.py:210-217), with the
    forward log-determinant accumulated for free.

    Args:
        z: (R, D) base samples.
        cproj: (L, 4, R, H) conditioning cache rows aligned with z (or None).

    Returns:
        (x, logdet) with logdet (R,) = log|det dx/dz|.
    """
    conditional = cfg.effective_cond_dim() > 0
    layers = _layer_tree(params)
    if cproj is None:
        cproj = jnp.zeros((cfg.n_layers, 4, z.shape[0], 1))

    def body(carry, inp):
        x, logdet = carry
        layer, cp = inp
        return forward_layer(layer, cp, x, logdet, conditional), None

    (x, logdet), _ = jax.lax.scan(
        body, (z, jnp.zeros(z.shape[0], z.dtype)), (layers, cproj)
    )
    return x, logdet


def forward_layer(layer, cp, x, logdet, conditional: bool):
    """One coupling layer of the base->data direction (the body of
    `forward`'s scan, exposed for the pipeline-parallel runner in
    parallel/pipeline.py — the mirror of `inverse_layer`).

    Args:
        layer: this layer's weight pytree (leading L axis already indexed).
        cp: (4, R, H) conditioning projections for this layer.
    """
    # Masks are structural constants (a registered buffer in the
    # reference, flows.py:188) — never trained.
    mask = jax.lax.stop_gradient(layer.masks)
    x_masked = x * mask
    s, t = _st_nets(layer, x_masked, cp, conditional)
    s = s * (1.0 - mask)
    t = t * (1.0 - mask)
    x = x_masked + (1.0 - mask) * (x * jnp.exp(s) + t)
    return x, logdet + jnp.sum(s, axis=1)


def inverse_layer(layer, cp, z, logdet, conditional: bool):
    """One coupling layer of the data->base direction (the body of
    `inverse`'s scan, exposed for the pipeline-parallel runner in
    parallel/pipeline.py).

    Args:
        layer: this layer's weight pytree (leading L axis already indexed).
        cp: (4, R, H) conditioning projections for this layer.
    """
    mask = jax.lax.stop_gradient(layer.masks)
    z_masked = z * mask
    s, t = _st_nets(layer, z_masked, cp, conditional)
    s = s * (1.0 - mask)
    t = t * (1.0 - mask)
    z = (1.0 - mask) * (z - t) * jnp.exp(-s) + z_masked
    return z, logdet - jnp.sum(s, axis=1)


def inverse(
    params: RealNVPParams,
    cfg: RealNVPConfig,
    x: jax.Array,
    cproj: jax.Array | None = None,
):
    """Data -> base (flows.py:219-227).

    Returns:
        (z, logdet) with logdet (R,) = log|det dz/dx| (the backward_p sign).
    """
    conditional = cfg.effective_cond_dim() > 0
    layers = _layer_tree(params)
    if cproj is None:
        cproj = jnp.zeros((cfg.n_layers, 4, x.shape[0], 1))

    def body(carry, inp):
        z, logdet = carry
        layer, cp = inp
        return inverse_layer(layer, cp, z, logdet, conditional), None

    (z, logdet), _ = jax.lax.scan(
        body,
        (x, jnp.zeros(x.shape[0], x.dtype)),
        (layers, cproj),
        reverse=True,
    )
    return z, logdet


def _actnorm(x, mu, logvar, reverse: bool):
    """RLE actnorm transform (flows.py:54-72)."""
    if reverse:  # x -> z
        logdet = jnp.zeros(x.shape[:-1], x.dtype)
        if mu is not None:
            x = x - mu
            if logvar is not None:
                x = x * jnp.exp(-0.5 * logvar)
                logdet = -0.5 * jnp.sum(logvar, -1)
        return x, logdet
    if mu is not None:
        if logvar is not None:
            x = jnp.exp(0.5 * logvar) * x
        x = x + mu
    return x


def log_prob(
    params: RealNVPParams,
    cfg: RealNVPConfig,
    x: jax.Array,
    feat: jax.Array | None = None,
    mu: jax.Array | None = None,
    logvar: jax.Array | None = None,
    weights: jax.Array | None = None,
    cproj: jax.Array | None = None,
) -> jax.Array:
    """Visibility-weighted log density (flows.py:271-331).

    Args:
        x: (B, D*K') data; reshaped to rows of cfg.dim.
        feat: (B, F) conditioning feature (conditional mode); ignored if a
            precomputed `cproj` is supplied.
        mu/logvar: actnorm statistics for tsfm_on in {'x','z'} — (B, D*K').
        weights: (B, D*K') visibility; only weights[:, 0] of each row is used,
            matching the reference.

    Returns:
        (B,) log probability summed over rows.
    """
    bs = x.shape[0]
    d = cfg.dim
    rows = x.reshape(-1, d)
    if weights is None:
        w_row = jnp.ones(rows.shape[0], x.dtype)
    else:
        if d not in (2, 3):
            # Per-row visibility weighting only makes sense when rows ARE
            # joints (per-joint independent modeling); the reference
            # refuses anything else too (flows.py:283-284) — silently
            # applying joint-0's visibility to a whole 45-dim pose row
            # would be a wrong loss. The one value the reference DOES
            # accept is all-ones (its own `torch.ones_like(x)` default):
            # mirror that for concrete arrays; traced values can't be
            # inspected, so they are refused like every other non-default.
            if isinstance(weights, jax.core.Tracer) or not bool(
                jnp.all(jnp.asarray(weights) == 1)
            ):
                raise NotImplementedError(
                    f"visibility weights need per-joint rows (dim 2/3), "
                    f"got dim={d} (only all-ones weights are accepted "
                    f"there, matching flows.py:283-284)"
                )
            w_row = jnp.ones(rows.shape[0], x.dtype)
        else:
            w_row = weights.reshape(-1, d)[:, 0]

    mu_r = logvar_r = None
    if cfg.tsfm_on in ("x", "z") and mu is not None:
        mu_r = mu.reshape(-1, d)
        logvar_r = None if logvar is None else logvar.reshape(-1, d)
    logdet_sigma = jnp.zeros(rows.shape[0], x.dtype)
    # mu=None: the actnorm is the identity (the reference's _tsfm skips
    # it too, flows.py:54-72) — calling through would hit the unbound
    # mu_r.
    if cfg.tsfm_on == "x" and mu_r is not None:
        rows, logdet_sigma = _actnorm(rows, mu_r, logvar_r, reverse=True)

    if cproj is None and cfg.effective_cond_dim() > 0:
        cond = make_cond(params, cfg, feat)
        cproj = cond_cache(params, cfg, cond)

    z, logdet = inverse(params, cfg, rows, cproj)
    if cfg.tsfm_on == "z" and mu_r is not None:
        z, logdet_sigma = _actnorm(z, mu_r, logvar_r, reverse=True)

    lp = (_std_normal_logp(z) + logdet + logdet_sigma) * w_row
    return lp.reshape(bs, -1).sum(1)


def sample(
    params: RealNVPParams,
    cfg: RealNVPConfig,
    key: jax.Array,
    batch_rows: int,
    feat: jax.Array | None = None,
    temp: float = 0.7,
    mu: jax.Array | None = None,
    logvar: jax.Array | None = None,
    cproj: jax.Array | None = None,
    return_log_prob: bool = False,
):
    """Draw `batch_rows` base samples and push them through the flow
    (flows.py:333-359), optionally returning their log density from the same
    forward pass (no second inverse pass).

    Args:
        batch_rows: number of D-dim rows to draw (callers flatten K' joints
            and/or N hypotheses into rows).
        cproj: precomputed conditioning cache aligned with the rows; when
            None it is built from `feat`.

    Returns:
        x: (batch_rows, D); optionally (x, log_prob (batch_rows,)).
    """
    d = cfg.dim
    z0 = jax.random.normal(key, (batch_rows, d)) * temp
    z = z0
    actnorm_ld = jnp.zeros((), z0.dtype)
    if cfg.tsfm_on in ("x", "z") and mu is not None and logvar is not None:
        # The scale part of the actnorm contributes 0.5*sum(logvar) to
        # log|det dx/dz0| (the shift is volume-preserving).
        actnorm_ld = 0.5 * jnp.sum(logvar.reshape(-1, d), -1)
    if cfg.tsfm_on == "z" and mu is not None:
        z = _actnorm(z, mu.reshape(-1, d),
                     None if logvar is None else logvar.reshape(-1, d),
                     reverse=False)
    if cproj is None and cfg.effective_cond_dim() > 0:
        cond = make_cond(params, cfg, feat)
        cproj = cond_cache(params, cfg, cond)
    x, fwd_logdet = forward(params, cfg, z, cproj)
    if cfg.tsfm_on == "x" and mu is not None:
        x = _actnorm(x, mu.reshape(-1, d),
                     None if logvar is None else logvar.reshape(-1, d),
                     reverse=False)
    if return_log_prob:
        # log q(x) = log N(z0) - log|det dx/dz0|, INCLUDING the actnorm
        # scale when tsfm 'x'/'z' is active (it was silently omitted —
        # densities were wrong by 0.5*sum(logvar) per row).
        lp = _std_normal_logp(z0) - fwd_logdet - actnorm_ld
        return x, lp
    return x
