"""Gather-free bilinear resampling via factorized tent-weight matmuls.

The dual of ops/scatter.py: sampling a field at P arbitrary points is

    s_p = sum_hw tent(y_p - h) * tent(x_p - w) * F[h, w]
        = rowsum((Wy @ F) * Wx)

— two dense ops that ride the MXU instead of XLA's slow gather (measured
~100 M scalar gathers/s vs ~100 TFLOPs matmul on v5e). Points outside the
field get zero weight, so out-of-frame samples return 0.

Used for the rotated-bin transport engine's field rotations (sim/rbt.py),
where 19M bilinear samples per scene change would cost ~800 ms as gathers
but ~10 ms as bf16 matmuls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("chunk", "precision"))
def gather_bilinear_mxu(field: jax.Array, points: jax.Array, chunk: int = 65536,
                        precision: str = "bf16") -> jax.Array:
    """Sample field (H, W[, C]) at points (P, 2)=(x, y) texel coords -> (P[, C]).

    Texel centers at integer + 0.5 (same convention as core.sampling).
    P must be a multiple-friendly static size; processed in `chunk` blocks
    with lax.map to keep compile size bounded.
    """
    squeeze = field.ndim == 2
    if squeeze:
        field = field[..., None]
    h, w, c = field.shape
    p = points.shape[0]
    dt = jnp.bfloat16 if precision == "bf16" else jnp.float32
    flat = field.reshape(h, w * c).astype(dt)
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)

    pad = (-p) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    blocks = pts.reshape(-1, chunk, 2)

    def one(block):
        y = block[:, 1] - 0.5
        x = block[:, 0] - 0.5
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(y[:, None] - ys)).astype(dt)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - xs))
        rows = jnp.matmul(wy, flat, preferred_element_type=jnp.float32)
        rows = rows.reshape(chunk, w, c)
        return jnp.einsum("pw,pwc->pc", wx, rows)

    out = jax.lax.map(one, blocks).reshape(-1, c)[:p]
    return out[..., 0] if squeeze else out
