"""Scatter-add without atomics: the TPU-native replacement for InterlockedAdd.

The reference's fundamental sync primitive is an atomic fixed-point add into
the lightmap (ForwardMonteCarlo.compute:68-105). TPU has no atomics, and
XLA's general scatter lowers to pathologically slow/huge code for millions of
updates. Instead, a bilinear splat factorizes exactly into tent-weighted
one-hot matrices along each axis:

    L[h, w] += sum_d tent(y_d - h) * tent(x_d - w) * v_d
             = (Wy^T @ (Wx * v))[h, w]

so the whole deposit stream becomes a chain of (H, C) @ (C, W*3) matmuls on
the MXU — deterministic, dense, and fast. The tent function
max(0, 1 - |p - i|) reproduces the reference's 4-tap bilinear weights
(WritePhoton_Bilinear, ForwardMonteCarlo.compute:88-97) including the
silent dropping of out-of-frame taps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scatter_add_bilinear_mxu(accum: jax.Array, pos: jax.Array, values: jax.Array,
                             chunk: int = 16384) -> jax.Array:
    """accum (H, W, C) += bilinear splat of values (D, C) at pos (D, 2)=(x, y).

    Positions are in texel coordinates (texel centers at integer + 0.5),
    matching WritePhoton_Bilinear's location convention. D must be static.
    """
    h, w, c = accum.shape
    d = pos.shape[0]
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    out = accum.reshape(h, w * c)
    for s in range(0, d, chunk):
        p = pos[s:s + chunk]
        v = values[s:s + chunk]
        y = p[:, 1] - 0.5
        x = p[:, 0] - 0.5
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(y[:, None] - ys))      # (C, H)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - xs))      # (C, W)
        b = (wx[:, :, None] * v[:, None, :]).reshape(p.shape[0], w * c)
        out = out + jnp.matmul(wy.T, b, preferred_element_type=jnp.float32)
    return out.reshape(h, w, c)


def scatter_add_nearest_mxu(accum: jax.Array, pos: jax.Array, values: jax.Array,
                            chunk: int = 16384) -> jax.Array:
    """Single-texel (indexed) variant of the matmul scatter: box weights
    replicate WritePhoton_Indexed's floor() addressing."""
    h, w, c = accum.shape
    d = pos.shape[0]
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    out = accum.reshape(h, w * c)
    for s in range(0, d, chunk):
        p = pos[s:s + chunk]
        v = values[s:s + chunk]
        iy = jnp.floor(p[:, 1])
        ix = jnp.floor(p[:, 0])
        wy = (jnp.abs(iy[:, None] - ys) < 0.5).astype(jnp.float32)
        wx = (jnp.abs(ix[:, None] - xs) < 0.5).astype(jnp.float32)
        b = (wx[:, :, None] * v[:, None, :]).reshape(p.shape[0], w * c)
        out = out + jnp.matmul(wy.T, b, preferred_element_type=jnp.float32)
    return out.reshape(h, w, c)
