"""Batched image rotation via Pallas shear kernels.

Rotation decomposes into three shears (Paeth): R(t) = Sx(a) Sy(b) Sx(a)
with a = -tan(t/2), b = sin(t). A shear is a per-row 1-D resample with a
row-dependent fractional shift — on TPU that is two dynamic lane rolls and
a lerp per row, bandwidth-bound, where XLA's per-row dynamic-slice lowering
measured ~2 GB/s and a factorized tent-matmul costs P*S^2 MACs per bin.

Angles outside [-45, 45] degrees are handled by a quadrant pre-rotation
(jnp.rot90 layout ops). The batch axis carries a DIFFERENT angle per image
(the RBT engine's direction bins), with per-bin shear coefficients
scalar-prefetched into the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 8


def _shear_kernel_factory(row_div: int, elem_scale: int, n_texels: int,
                          center: float, width: int, k_max: int):
    def kernel(coef_ref, img_ref, out_ref):
        lane_texel = jax.lax.broadcasted_iota(jnp.int32, (ROW_BLOCK, width), 1) // elem_scale
        d = pl.program_id(0)
        rblk = pl.program_id(1)
        coef = coef_ref[d]

        # Per-row shifts; within a block they span at most k_max texels, so
        # the block is rolled ONCE by the common base and each row selects
        # among k_max statically shifted copies — all (8, W) vector ops
        # (per-row (1, W) rolls waste 7/8 of the sublanes).
        row0 = rblk * ROW_BLOCK
        ss = []
        for r in range(ROW_BLOCK):
            rt = ((row0 + r) // row_div).astype(jnp.float32)
            ss.append(coef * (rt + 0.5 - center))
        s_vec = jnp.stack(ss).reshape(ROW_BLOCK, 1)
        i_vec = jnp.floor(s_vec).astype(jnp.int32)
        f_vec = s_vec - i_vec.astype(jnp.float32)
        base = jnp.minimum(i_vec[0, 0], i_vec[ROW_BLOCK - 1, 0])
        res = i_vec - base  # (8, 1) in [0, k_max)

        block = img_ref[0]
        # Shifts must be non-negative: Mosaic's dynamic rotate mishandles
        # negative shifts on multi-vreg rows (observed off-by-128 lanes).
        rolled = pltpu.roll(block, (-base * elem_scale) % width, axis=1)

        acc = jnp.zeros((ROW_BLOCK, width), jnp.float32)
        src_texel = lane_texel + i_vec  # (8, W) sampled texel for v0
        valid0 = (src_texel >= 0) & (src_texel < n_texels)
        valid1 = (src_texel + 1 >= 0) & (src_texel + 1 < n_texels)
        for k in range(k_max + 1):
            shifted = pltpu.roll(rolled, (-k * elem_scale) % width, axis=1)
            w0 = jnp.where((res == k) & valid0, 1.0 - f_vec * jnp.ones((1, width)), 0.0)
            w1 = jnp.where((res == k - 1) & valid1, f_vec * jnp.ones((1, width)), 0.0)
            acc = acc + shifted.astype(jnp.float32) * (w0 + w1)
        out_ref[0] = acc.astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("row_div", "elem_scale", "n_texels"))
def shear(img: jax.Array, coef: jax.Array, row_div: int, elem_scale: int,
          n_texels: int) -> jax.Array:
    """out[d, r, l] = img[d, r, l + round-interp(coef[d] * (r//row_div + .5 - c))].

    img (D, R, W); the shift axis is the lane axis in units of `elem_scale`
    lanes per texel (3 for channel-interleaved x shears, 1 otherwise).
    """
    d, rows, width = img.shape
    assert rows % ROW_BLOCK == 0, rows
    pad = (-width) % 128  # tpu.dynamic_rotate requires 128-aligned lanes
    if pad:
        img = jnp.pad(img, ((0, 0), (0, 0), (0, pad)))
    # Residual span of integer shifts within an 8-row block: |coef| <= 1
    # always holds for the rotation decomposition (tan(22.5deg), sin(45deg)).
    k_max = int(np.ceil(ROW_BLOCK * 1.0 / row_div)) + 1
    kernel = _shear_kernel_factory(row_div, elem_scale, n_texels,
                                   n_texels / 2.0, width + pad, k_max)
    wp = width + pad
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(d, rows // ROW_BLOCK),
        in_specs=[pl.BlockSpec((1, ROW_BLOCK, wp), lambda i, j, c: (i, j, 0))],
        out_specs=pl.BlockSpec((1, ROW_BLOCK, wp), lambda i, j, c: (i, j, 0)),
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(img.shape, img.dtype),
        interpret=jax.default_backend() != "tpu",
    )(coef, img)
    return out[..., :width] if pad else out


def rotate_bins(images: jax.Array, angles: jax.Array) -> jax.Array:
    """Rotate each (S, S, C) image in (D, S, S, C) by its own angle:
    out[d][p] = images[d][R(angles[d]) (p - c) + c], zero outside."""
    d, s, s2, c = images.shape
    assert s == s2 and s % ROW_BLOCK == 0

    # Quadrant pre-rotation: sampling with R(t) = R(tr) R90^k means first
    # re-laying the image by R90^k (a rot90 of the array), then the residual.
    k = jnp.round(angles / (np.pi / 2)).astype(jnp.int32) % 4
    residual = angles - jnp.round(angles / (np.pi / 2)) * (np.pi / 2)

    rots = [images,
            jnp.rot90(images, 1, axes=(1, 2)),
            jnp.rot90(images, 2, axes=(1, 2)),
            jnp.rot90(images, 3, axes=(1, 2))]
    sel = jnp.stack(rots)  # (4, D, S, S, C)
    pre = jnp.take_along_axis(sel, k[None, :, None, None, None], axis=0)[0]

    alpha = -jnp.tan(residual / 2.0)
    beta = jnp.sin(residual)

    flat = pre.reshape(d, s, s * c)
    flat = shear(flat, alpha, row_div=1, elem_scale=c, n_texels=s)
    # Vertical shear: transpose so y is the lane axis.
    t = flat.reshape(d, s, s, c).transpose(0, 2, 3, 1).reshape(d, s * c, s)
    t = shear(t, beta, row_div=c, elem_scale=1, n_texels=s)
    flat = t.reshape(d, s, c, s).transpose(0, 3, 1, 2).reshape(d, s, s * c)
    flat = shear(flat, alpha, row_div=1, elem_scale=c, n_texels=s)
    return flat.reshape(d, s, s, c)


def rotate_bins_uniform(images: jax.Array, angles: tuple) -> jax.Array:
    """rotate_bins with STATIC per-image angles: the quadrant pre-rotation
    becomes static group slices + rot90 (the traced-angle version stacks 4
    full copies and gathers — ~x4 memory traffic)."""
    d, s, s2, c = images.shape
    assert s == s2 and s % ROW_BLOCK == 0 and len(angles) == d

    ks = [int(round(a / (np.pi / 2))) % 4 for a in angles]
    residual = [a - round(a / (np.pi / 2)) * (np.pi / 2) for a in angles]

    groups = []
    start = 0
    for i in range(1, d + 1):
        if i == d or ks[i] != ks[start]:
            groups.append((start, i, ks[start]))
            start = i
    pre = jnp.concatenate([
        jnp.rot90(images[a:b], k, axes=(1, 2)) if k else images[a:b]
        for a, b, k in groups], axis=0)

    alpha = jnp.asarray([-np.tan(t / 2.0) for t in residual], jnp.float32)
    beta = jnp.asarray([np.sin(t) for t in residual], jnp.float32)

    flat = pre.reshape(d, s, s * c)
    flat = shear(flat, alpha, row_div=1, elem_scale=c, n_texels=s)
    t = flat.reshape(d, s, s, c).transpose(0, 2, 3, 1).reshape(d, s * c, s)
    t = shear(t, beta, row_div=c, elem_scale=1, n_texels=s)
    flat = t.reshape(d, s, c, s).transpose(0, 3, 1, 2).reshape(d, s, s * c)
    flat = shear(flat, alpha, row_div=1, elem_scale=c, n_texels=s)
    return flat.reshape(d, s, s, c)
