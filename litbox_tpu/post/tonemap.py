"""Tone mapping curves (reference: Assets/Shaders/ToneMapping.cginc).

Two operators, matching the reference's fullscreen materials
(LitboxToneMapping_UE5.shader / LitboxToneMapping_Uchimura.shader) driven by
the ForceHDR_* camera components.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def _smoothstep(lo, hi, x):
    t = jnp.clip((x - lo) / (hi - lo), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


@dataclasses.dataclass(frozen=True)
class UE5Shape:
    """ToneMap_UE5_DefaultShape (ToneMapping.cginc:7-10)."""

    exposure: float = 0.0
    white_point: float = 2.0
    black_point: float = -4.0


def tonemap_ue5(x: jax.Array, shape: UE5Shape = UE5Shape()) -> jax.Array:
    """smoothstep(black, white, log10(x) + exposure) (ToneMapping.cginc:14-16)."""
    return _smoothstep(shape.black_point, shape.white_point,
                       jnp.log10(jnp.maximum(x, 1e-30)) + shape.exposure)


def smoothstep_inverse(y: jax.Array) -> jax.Array:
    """Closed-form inverse of t*t*(3-2t) on [0, 1]:
    t = 1/2 - sin(asin(1 - 2y) / 3)."""
    y = jnp.clip(y, 0.0, 1.0)
    return 0.5 - jnp.sin(jnp.arcsin(1.0 - 2.0 * y) / 3.0)


# The reference's dataset/golden PNG writer tone-maps with THESE constants
# (TextureExtensions.SaveTexturePNG:311-350: UE5 curve, white=2, black=-3,
# per-scene auto exposure) into an sRGB target — so a stored golden byte is
# sRGB_encode(smoothstep(-3, 2, log10(x) + e)). GOLDEN_PNG_SHAPE is the
# exposure-free part; the unknown per-scene exposure is a pure 10^-e scale
# on the recovered radiance, which per-image gray-point normalization (the
# same one training uses) absorbs.
GOLDEN_PNG_SHAPE = UE5Shape(exposure=0.0, white_point=2.0, black_point=-3.0)


def tonemap_ue5_inverse(y: jax.Array,
                        shape: UE5Shape = GOLDEN_PNG_SHAPE) -> jax.Array:
    """Invert tonemap_ue5: y in [0, 1] -> linear radiance.

    Exact where the curve is invertible; clipped inputs (y = 0 or 1) pin to
    the black/white points 10^black, 10^white — information the tonemap
    destroyed. Used to linearize the reference's golden PNGs into the HDR
    domain the denoiser trains on (VERDICT r4 next #4: the round-4 golden
    eval decoded them as plain gamma, leaving the net in a domain it never
    saw)."""
    t = smoothstep_inverse(y)
    logx = (shape.black_point
            + t * (shape.white_point - shape.black_point) - shape.exposure)
    return 10.0 ** logx


@dataclasses.dataclass(frozen=True)
class UchimuraShape:
    """GT tonemapper parameters (ToneMapping.cginc:24-35)."""

    contrast: float = 1.0
    linear_base: float = 0.22
    linear_span: float = 0.4
    black_tightness: float = 1.33
    black_pedestal: float = 0.0
    maximum_brightness: float = 1.0


def tonemap_uchimura(x: jax.Array, shape: UchimuraShape = UchimuraShape()) -> jax.Array:
    """Simplified GT tonemapper: toe / linear / shoulder (ToneMapping.cginc:39-63)."""
    a, m, l = shape.contrast, shape.linear_base, shape.linear_span
    c, b, p = shape.black_tightness, shape.black_pedestal, shape.maximum_brightness

    l0 = (p - m) * l / a
    s0 = m + l0
    s1 = m + a * l0
    c2 = (a * p) / (p - s1)
    cp = -c2 / p

    w0 = 1.0 - _smoothstep(0.0, m, x)
    w2 = jnp.where(x >= m + l0, 1.0, 0.0)
    w1 = 1.0 - w0 - w2

    t = m * jnp.maximum(x / m, 0.0) ** c + b
    lin = m + a * (x - m)
    s = p - (p - s1) * jnp.exp(cp * (x - s0))
    return t * w0 + lin * w1 + s * w2


def srgb_encode(x: jax.Array) -> jax.Array:
    """pow(1/2.2) approximation used throughout the reference."""
    return jnp.clip(x, 0.0, 1.0) ** (1.0 / 2.2)
