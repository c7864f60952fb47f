"""Density toolbox: smooth-uniform energies, deadzone Laplace, log-space and
categorical distributions.

Capability parity with the reference's toolbox
(/root/reference/hand/network.py:143-306): `_ApproxUniform` (rect & ball
supports with exact sampling), `_LogDist`, `_Laplace` with the reconstruction
deadzone and visibility masking, `_Categorical`, `_DummyDist`. All pure
functions of (params, data, key) — no module state, no device literals.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


class ApproxUniform(NamedTuple):
    """Smooth-uniform energy log p̃(x) = -alpha * relu(d(x) - 1)^2.

    rect: d = |x - c| / r per dim (summed); ball: d = |x - a| / b.
    (network.py:143-180)
    """

    a: jax.Array | float  # rect: low; ball: centre (D,)
    b: jax.Array | float  # rect: high; ball: radius
    alpha: float = 1.0
    sup: str = "rec"

    def log_prob(self, x: jax.Array) -> jax.Array:
        if self.sup == "rec":
            centre = (self.a + self.b) / 2.0
            radius = (self.b - self.a) / 2.0
            d = jax.nn.relu(jnp.abs(x - centre) / radius - 1.0)
            return -(self.alpha * d**2).sum(-1)
        if self.sup == "ball":
            r = jnp.linalg.norm(x - self.a, axis=-1)
            return -self.alpha * jax.nn.relu(r / self.b - 1.0) ** 2
        raise NotImplementedError(self.sup)

    def sample(self, key: jax.Array, sample_shape: tuple) -> jax.Array:
        if self.sup == "rec":
            u = jax.random.uniform(key, sample_shape)
            return u * (self.b - self.a) + self.a
        if self.sup == "ball":
            # Uniform in the D-ball: direction x radius * u^(1/2) (matches the
            # reference's sampler, network.py:173-178 — note the reference
            # uses u^0.5 regardless of D).
            k1, k2 = jax.random.split(key)
            dim = self.a.shape[-1]
            r = self.b * jax.random.uniform(k1, sample_shape) ** 0.5
            x = jax.random.normal(k2, (*sample_shape, dim))
            x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-16)
            return x * r[..., None] + self.a
        raise NotImplementedError(self.sup)


def laplace_deadzone_log_prob(
    x: jax.Array,
    mu: jax.Array,
    b,
    weights: jax.Array | None = None,
    deadzone: float = 1e-4,
) -> jax.Array:
    """Visibility-masked Laplace with a reconstruction deadzone.

    log p = sum_vis [ -(relu(|x - mu| - dz) + dz) / b - log(2b) ]
    (network.py:233-258). `weights == 1` selects contributing terms.

    Args:
        x, mu: (B, D) flattened observations / predictions.
        b: scalar or (B, D) Laplace scale.
        weights: (B, D) visibility codes; terms count when == 1.

    Returns:
        (B,) log probability.
    """
    if weights is None:
        mask = jnp.ones_like(mu)
    else:
        mask = (weights == 1.0).astype(mu.dtype)
    err = jax.nn.relu(jnp.abs(x - mu) - deadzone) + deadzone
    terms = mask * (-err / b - jnp.log(2.0 * b))
    return terms.reshape(terms.shape[0], -1).sum(1)


def laplace_sample(key: jax.Array, mu: jax.Array, b) -> jax.Array:
    e = jax.random.laplace(key, mu.shape, mu.dtype)
    return mu + b * e


class LogDist(NamedTuple):
    """Density of log s when s ~ Normal: log p_logs(x) = log p_s(x) - log x
    (network.py:183-197)."""

    loc: float
    scale: float

    def log_prob(self, x: jax.Array) -> jax.Array:
        z = (x - self.loc) / self.scale
        normal_lp = -0.5 * z**2 - math.log(self.scale) - 0.5 * math.log(2 * math.pi)
        return normal_lp - jnp.log(x)


def categorical_log_prob(logits: jax.Array) -> jax.Array:
    """log softmax over the last axis (network.py:285-289)."""
    return jax.nn.log_softmax(logits, axis=-1)


def std_normal_logp(z: jax.Array) -> jax.Array:
    """Standard-normal log density summed over the LAST axis (the flow base
    distribution, flows.py:157). One definition shared by both flow
    families' XLA paths and the fused samplers' epilogues."""
    d = z.shape[-1]
    return -0.5 * jnp.sum(z * z, axis=-1) - 0.5 * d * math.log(2.0 * math.pi)


def categorical_sample(key: jax.Array, logits: jax.Array, temp: float = 1.0) -> jax.Array:
    return jax.random.categorical(key, logits / (temp + 1e-16), axis=-1)


def gaussian_kl(mean: jax.Array, std: jax.Array, goal_std: float = 1.0) -> jax.Array:
    """KL(N(mean, std) || N(0, 1)) summed over dims (criteria.py:13-15)."""
    return 0.5 * jnp.sum(mean**2 + std**2 - jnp.log(std**2) - goal_std, axis=1)
