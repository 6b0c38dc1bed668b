"""2D simplex noise (reference: Assets/Shaders/Noise2D.cginc, the standard
ashima/keijiro GLSL simplex noise), vectorized JAX."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _mod289(x):
    return x - jnp.floor(x * (1.0 / 289.0)) * 289.0


def _permute(x):
    return _mod289((x * 34.0 + 1.0) * x)


def snoise(v: jax.Array) -> jax.Array:
    """Simplex noise at points (..., 2); output in [-1, 1]."""
    cx = 0.211324865405187
    cy = 0.366025403784439
    cz = -0.577350269189626
    cw = 0.024390243902439

    i = jnp.floor(v + jnp.sum(v, -1, keepdims=True) * cy)
    x0 = v - i + jnp.sum(i, -1, keepdims=True) * cx

    i1x = (x0[..., 0] >= x0[..., 1]).astype(v.dtype)
    i1 = jnp.stack([i1x, 1.0 - i1x], -1)

    x1 = x0 + cx - i1
    x2 = x0 + cz

    i = _mod289(i)
    p = _permute(_permute(i[..., 1:2] + jnp.stack(
        [jnp.zeros_like(i1x), i1[..., 1], jnp.ones_like(i1x)], -1))
        + i[..., 0:1] + jnp.stack(
        [jnp.zeros_like(i1x), i1[..., 0], jnp.ones_like(i1x)], -1))

    d = jnp.stack([jnp.sum(x0 * x0, -1), jnp.sum(x1 * x1, -1), jnp.sum(x2 * x2, -1)], -1)
    m = jnp.maximum(0.5 - d, 0.0)
    m = m * m
    m = m * m

    x = 2.0 * jnp.modf(p * cw)[0] - 1.0
    h = jnp.abs(x) - 0.5
    ox = jnp.floor(x + 0.5)
    a0 = x - ox

    m = m * (1.79284291400159 - 0.85373472095314 * (a0 * a0 + h * h))

    g = jnp.stack([
        a0[..., 0] * x0[..., 0] + h[..., 0] * x0[..., 1],
        a0[..., 1] * x1[..., 0] + h[..., 1] * x1[..., 1],
        a0[..., 2] * x2[..., 0] + h[..., 2] * x2[..., 1],
    ], -1)
    return 130.0 * jnp.sum(m * g, -1)


def snoise01(v: jax.Array) -> jax.Array:
    return snoise(v) * 0.5 + 0.5
