"""Multi-layer foreground cloud relighting.

Reference: Assets/Resources/CloudGaussianBlur.compute (directional Gaussian
blur of HDR x transmissibility^depth along a kernel of sample offsets) +
Assets/Demo_Abduction/Shaders/CloudForegroundShader.shader +
Assets/Demo_Abduction/Scripts/CloudGroupController.cs:74-90 (two-pass
separable blur driving foreground sprite shading).

Foreground layers at depth d are lit by the simulation output blurred with a
Gaussian whose taps are attenuated by transmissibility^d: deeper layers see
softer, dimmer light.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _gaussian_kernel(n: int, sigma: float) -> jax.Array:
    x = jnp.arange(n, dtype=jnp.float32) - (n - 1) / 2
    w = jnp.exp(-0.5 * (x / sigma) ** 2)
    return w / w.sum()


@functools.partial(jax.jit, static_argnames=("taps", "axis"))
def directional_blur(hdr: jax.Array, transmissibility: jax.Array,
                     transmission_depth, sigma, taps: int = 15,
                     axis: int = 1) -> jax.Array:
    """One pass of CloudForegroundBlur: sum_i w_i * hdr(uv_i) * t(uv_i)^depth."""
    w = _gaussian_kernel(taps, sigma)
    att = transmissibility[..., None] ** transmission_depth
    src = hdr[..., :3] * att
    out = jnp.zeros_like(src)
    half = taps // 2
    for i in range(taps):
        shift = i - half
        out = out + w[i] * jnp.roll(src, -shift, axis=axis)
    return out


@functools.partial(jax.jit, static_argnames=("taps",))
def relight_layer(hdr: jax.Array, transmissibility: jax.Array,
                  transmission_depth, sigma, taps: int = 15) -> jax.Array:
    """Two-pass separable blur (CloudGroupController.cs:74-90)."""
    h = directional_blur(hdr, transmissibility, transmission_depth, sigma, taps, axis=1)
    return directional_blur(h, jnp.ones_like(transmissibility), 1.0, sigma, taps, axis=0)


@jax.jit
def shade_foreground(sprite_rgba: jax.Array, blurred_light: jax.Array,
                     transmissibility: jax.Array, obscurity_power=1.5) -> jax.Array:
    """CloudForegroundShader-style puff shading: sprite color modulated by
    the blurred light with a transmissibility obscurity power law; returns
    premultiplied RGBA for compositing."""
    obscurity = transmissibility[..., None] ** obscurity_power
    lit = sprite_rgba[..., :3] * blurred_light * obscurity
    alpha = sprite_rgba[..., 3:4]
    return jnp.concatenate([lit * alpha, alpha], axis=-1)
