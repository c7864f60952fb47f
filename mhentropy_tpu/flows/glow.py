"""Conditional Glow: actnorm + invertible linear + conditional affine
coupling, functional JAX.

Capability parity with the external ConditionalGlow the reference imports
from the nkolot/nflows fork (/root/reference/hand/network.py:20,343-344 and
CrossModalHand.py:101-104): a features-dim flow with `num_layers` steps of
(ActNorm, invertible 1x1/LU linear, context-conditioned affine coupling),
standard-normal base, APIs `log_prob(x, context)` and
`sample_and_log_prob(n, noise, context)`. Used for the 'glow' regressor mode
and as the engine for ProHMR-style SMPL flows (BASELINE config 5).

Note: the coupling transform-net here is a 2-block residual MLP with additive
context fusion. Loading released nflows checkpoints bit-exactly requires
matching that fork's ResidualNet internals — tools/convert_torch.py gains
that mapping when the weights are available to verify against; the
architecture (dims, layer counts, parameter shapes) is aligned for it.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST


class GlowConfig(NamedTuple):
    features: int = 45
    hidden: int = 512
    num_layers: int = 4
    num_blocks: int = 2
    context_features: int = 512

    @property
    def half(self) -> int:
        return self.features // 2


class GlowParams(NamedTuple):
    """Stacked per-step parameters (leading axis = step)."""

    an_log_scale: jax.Array  # (L, D) actnorm
    an_bias: jax.Array  # (L, D)
    lin_w: jax.Array  # (L, D, D) invertible linear
    # Coupling transform net: initial, `num_blocks` residual blocks (two
    # linears each, context added at block input), final -> 2 * (D - D/2).
    net_w_in: jax.Array  # (L, D/2, H)
    net_b_in: jax.Array
    net_ctx: jax.Array  # (L, C, H) context projection
    net_bctx: jax.Array
    blk_w0: jax.Array  # (L, K, H, H)
    blk_b0: jax.Array
    blk_w1: jax.Array
    blk_b1: jax.Array
    net_w_out: jax.Array  # (L, H, 2*(D - D/2))
    net_b_out: jax.Array


def init_params(key: jax.Array, cfg: GlowConfig) -> GlowParams:
    d, h, c, L, K = (
        cfg.features, cfg.hidden, cfg.context_features, cfg.num_layers,
        cfg.num_blocks,
    )
    d2 = cfg.half
    out = 2 * (d - d2)
    ks = iter(jax.random.split(key, 16))

    def glorot(shape, scale=1.0):
        fan_in, fan_out = shape[-2], shape[-1]
        std = scale * math.sqrt(2.0 / (fan_in + fan_out))
        return jax.random.normal(next(ks), shape) * std

    # Random rotations for the invertible linears (orthogonal init).
    w = jax.random.normal(next(ks), (L, d, d))
    q, _ = jnp.linalg.qr(w)
    return GlowParams(
        an_log_scale=jnp.zeros((L, d)),
        an_bias=jnp.zeros((L, d)),
        lin_w=q,
        net_w_in=glorot((L, d2, h)),
        net_b_in=jnp.zeros((L, h)),
        net_ctx=glorot((L, c, h)),
        net_bctx=jnp.zeros((L, h)),
        blk_w0=glorot((L, K, h, h)),
        blk_b0=jnp.zeros((L, K, h)),
        blk_w1=glorot((L, K, h, h)),
        blk_b1=jnp.zeros((L, K, h)),
        net_w_out=glorot((L, h, out), scale=0.01),  # near-identity couplings
        net_b_out=jnp.zeros((L, out)),
    )


def _coupling_net(step: GlowParams, x1: jax.Array, ctx_proj: jax.Array):
    """(R, D/2), (R, H) -> (shift, log_scale) each (R, D - D/2)."""
    h = jnp.dot(x1, step.net_w_in, precision=_PREC) + step.net_b_in + ctx_proj
    h = jax.nn.relu(h)
    for k in range(step.blk_w0.shape[0]):
        r = jnp.dot(h, step.blk_w0[k], precision=_PREC) + step.blk_b0[k]
        r = jax.nn.relu(r)
        r = jnp.dot(r, step.blk_w1[k], precision=_PREC) + step.blk_b1[k]
        h = jax.nn.relu(h + r)
    out = jnp.dot(h, step.net_w_out, precision=_PREC) + step.net_b_out
    shift, raw_scale = jnp.split(out, 2, axis=-1)
    # Softplus-style bounded scale (glow convention, keeps the map stable).
    log_scale = jnp.log(jax.nn.sigmoid(raw_scale + 2.0) + 1e-3)
    return shift, log_scale


def _step_params(params: GlowParams, i: int) -> GlowParams:
    return jax.tree_util.tree_map(lambda x: x[i], params)


def _ctx_cache(params: GlowParams, context: jax.Array) -> jax.Array:
    """(B, C) -> (L, B, H) context projections, computed once per image."""
    return (
        jnp.einsum("bc,lch->lbh", context, params.net_ctx, precision=_PREC)
        + params.net_bctx[:, None]
    )


def inverse(params: GlowParams, cfg: GlowConfig, x: jax.Array, ctx_proj: jax.Array):
    """data -> base with log|det dz/dx|."""
    logdet = jnp.zeros(x.shape[0], x.dtype)
    d2 = cfg.half
    for i in range(cfg.num_layers):
        step = _step_params(params, i)
        # ActNorm.
        x = (x - step.an_bias) * jnp.exp(-step.an_log_scale)
        logdet = logdet - jnp.sum(step.an_log_scale)
        # Invertible linear (solve for the inverse direction).
        w_inv = jnp.linalg.inv(step.lin_w)
        x = jnp.dot(x, w_inv.T, precision=_PREC)
        logdet = logdet - jnp.linalg.slogdet(step.lin_w)[1]
        # Conditional coupling on the second half.
        x1, x2 = x[:, :d2], x[:, d2:]
        shift, ls = _coupling_net(step, x1, ctx_proj[i])
        x2 = (x2 - shift) * jnp.exp(-ls)
        logdet = logdet - jnp.sum(ls, axis=1)
        x = jnp.concatenate([x1, x2], axis=1)
    return x, logdet


def forward(params: GlowParams, cfg: GlowConfig, z: jax.Array, ctx_proj: jax.Array):
    """base -> data with log|det dx/dz|."""
    logdet = jnp.zeros(z.shape[0], z.dtype)
    d2 = cfg.half
    for i in reversed(range(cfg.num_layers)):
        step = _step_params(params, i)
        z1, z2 = z[:, :d2], z[:, d2:]
        shift, ls = _coupling_net(step, z1, ctx_proj[i])
        z2 = z2 * jnp.exp(ls) + shift
        logdet = logdet + jnp.sum(ls, axis=1)
        z = jnp.concatenate([z1, z2], axis=1)
        z = jnp.dot(z, step.lin_w.T, precision=_PREC)
        logdet = logdet + jnp.linalg.slogdet(step.lin_w)[1]
        z = z * jnp.exp(step.an_log_scale) + step.an_bias
        logdet = logdet + jnp.sum(step.an_log_scale)
    return z, logdet


def _std_normal_logp(z):
    return -0.5 * jnp.sum(z * z, -1) - 0.5 * z.shape[-1] * math.log(2 * math.pi)


def log_prob(params: GlowParams, x: jax.Array, context: jax.Array,
             cfg: GlowConfig | None = None) -> jax.Array:
    """log q(x | context); context rows aligned with x rows."""
    cfg = cfg or GlowConfig(
        features=x.shape[-1], context_features=context.shape[-1],
        num_layers=params.an_bias.shape[0], hidden=params.net_b_in.shape[-1],
        num_blocks=params.blk_b0.shape[1],
    )
    ctx_proj = _ctx_cache(params, context)
    z, logdet = inverse(params, cfg, x, ctx_proj)
    return _std_normal_logp(z) + logdet


def sample_and_log_prob(
    params: GlowParams,
    context: jax.Array,
    key: jax.Array,
    n: int,
    temp: float = 1.0,
    cfg: GlowConfig | None = None,
):
    """Draw n hypotheses per context row, hypothesis-major (n*B, D), with
    their log density from the same pass (network.py:736-742 usage)."""
    b, c = context.shape
    cfg = cfg or GlowConfig(
        features=params.an_bias.shape[-1], context_features=c,
        num_layers=params.an_bias.shape[0], hidden=params.net_b_in.shape[-1],
        num_blocks=params.blk_b0.shape[1],
    )
    ctx_proj = _ctx_cache(params, context)  # (L, B, H)
    ctx_rows = jnp.tile(ctx_proj, (1, n, 1))  # hypothesis-major rows
    z0 = jax.random.normal(key, (n * b, cfg.features)) * temp
    x, logdet = forward(params, cfg, z0, ctx_rows)
    return x, _std_normal_logp(z0) - logdet
