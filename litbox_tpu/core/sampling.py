"""Texture and LUT sampling primitives.

These replace GPU sampler hardware (`sampler_linear_clamp`,
`sampler_point_clamp`, `SampleLUT` in LitboxCommon.cginc:125-134). Two
implementations are provided for small-table lookups: a gather (`take`) and a
one-hot matmul that rides the MXU — the production tracer picks per size.

Conventions: fields are (H, W[, C]) arrays indexed [y, x]; continuous
positions are in texel units with texel centers at (i + 0.5); `uv` variants
take [0, 1] coordinates like the reference's samplers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _clamp_idx(i: jax.Array, n: int) -> jax.Array:
    return jnp.clip(i, 0, n - 1)


def sample_nearest(field: jax.Array, xy: jax.Array) -> jax.Array:
    """Point-clamp sample at texel coords (..., 2) = (x, y)."""
    h, w = field.shape[0], field.shape[1]
    ix = _clamp_idx(jnp.floor(xy[..., 0]).astype(jnp.int32), w)
    iy = _clamp_idx(jnp.floor(xy[..., 1]).astype(jnp.int32), h)
    return field[iy, ix]


def sample_bilinear(field: jax.Array, xy: jax.Array) -> jax.Array:
    """Linear-clamp sample at texel coords (..., 2) = (x, y).

    Matches GPU bilinear filtering: texel centers at integer+0.5.
    """
    h, w = field.shape[0], field.shape[1]
    x = xy[..., 0] - 0.5
    y = xy[..., 1] - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None] if field.ndim == 3 else (x - x0)
    fy = (y - y0)[..., None] if field.ndim == 3 else (y - y0)
    ix0 = _clamp_idx(x0.astype(jnp.int32), w)
    iy0 = _clamp_idx(y0.astype(jnp.int32), h)
    ix1 = _clamp_idx(ix0 + 1, w)
    iy1 = _clamp_idx(iy0 + 1, h)
    v00 = field[iy0, ix0]
    v10 = field[iy0, ix1]
    v01 = field[iy1, ix0]
    v11 = field[iy1, ix1]
    top = v00 * (1 - fx) + v10 * fx
    bot = v01 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def sample_bilinear_uv(field: jax.Array, uv: jax.Array) -> jax.Array:
    size = jnp.array([field.shape[1], field.shape[0]], dtype=jnp.float32)
    return sample_bilinear(field, uv * size)


def sample_nearest_uv(field: jax.Array, uv: jax.Array) -> jax.Array:
    size = jnp.array([field.shape[1], field.shape[0]], dtype=jnp.float32)
    return sample_nearest(field, uv * size)


def sample_lut(table: jax.Array, u: jax.Array) -> jax.Array:
    """Sample a (N, C) LUT at u in [0, 1] with the reference's texel-center
    window adjustment (LUT.cs remarks: u' = 0.5/N + u*(1 - 1/N)) followed by
    linear filtering — net effect: x = u * (N - 1)."""
    n = table.shape[0]
    x = jnp.clip(u, 0.0, 1.0) * (n - 1)
    i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, n - 2)
    f = (x - i0.astype(x.dtype))[..., None]
    return table[i0] * (1 - f) + table[i0 + 1] * f


def sample_lut_mxu(table: jax.Array, u: jax.Array) -> jax.Array:
    """Same as sample_lut but as a one-hot matmul (gather-free, MXU-friendly).

    For a batch of B samples from an (N, C) table this is a B x N @ N x C
    matmul where each row of the one-hot matrix holds the two bilinear
    weights. Preferred on TPU for large batches over small tables.
    """
    n = table.shape[0]
    x = jnp.clip(u, 0.0, 1.0) * (n - 1)
    idx = jnp.arange(n, dtype=x.dtype)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(x[..., None] - idx))
    return jnp.matmul(w, table, preferred_element_type=jnp.float32)


def gather_2d(field: jax.Array, ix: jax.Array, iy: jax.Array) -> jax.Array:
    """Clamped integer gather from (H, W[, C])."""
    h, w = field.shape[0], field.shape[1]
    return field[_clamp_idx(iy, h), _clamp_idx(ix, w)]


def downsample2x_mean(img: jax.Array) -> jax.Array:
    """2x2 box downsample of (H, W[, C]); standard mip step."""
    h, w = img.shape[0] // 2, img.shape[1] // 2
    x = img[: h * 2, : w * 2]
    x = x.reshape((h, 2, w, 2) + x.shape[2:])
    return x.mean(axis=(1, 3))
