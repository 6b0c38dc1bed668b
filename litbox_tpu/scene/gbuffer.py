"""GBuffer rasterization and mip pyramid, fully jitted.

Replaces the reference's hidden ortho camera + RT/Object shader pass
(`SimulationCamera.cs:87-171`, `RTObjectMat.shader:79-90`) with an analytic
rasterizer: shapes are evaluated per pixel in draw order with the same blend
modes (albedo: premultiplied over; transmissibility: multiplicative;
normal+alignment: overwrite where covered).

Transmissibility per texel: t = (1 - density * alpha) ^ (100 / H), the
resolution-invariant exponent of RTObjectMat.shader:83-86.

Normal fields are derived analytically from the reference meshes:
  rect    — 4 fan triangles each carrying a constant outward edge normal
            (RTRect.cs:21-66): per-quadrant constant after the inverse-
            transpose transform and per-vertex normalization.
  ellipse — 32-segment fan, center normal (0,0,-1), rim normals radial
            (RTEllipse.cs:15-55): interpolation gives n = (r*rhat, -(1-r)).
  sprite  — flat (0,0,-1): no 2D normal, pure participating medium.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.sampling import sample_bilinear_uv
from ..core.types import (
    SHAPE_ELLIPSE,
    SHAPE_RECT,
    GBuffer,
    GBufferPyramid,
    affine_apply,
)
from .scene import Scene


def _shape_normal(kind: jax.Array, local: jax.Array, inv_lin_t: jax.Array) -> jax.Array:
    """World-space (nx, ny, nz) for pixels at `local` (..., 2) in shape space.

    `inv_lin_t` is the 2x2 inverse-transpose of the shape's linear part
    (Unity's UnityObjectToWorldNormal, normalized per vertex).
    """
    eps = 1e-20

    # Rect: constant outward edge normal per fan quadrant.
    ax, ay = jnp.abs(local[..., 0]), jnp.abs(local[..., 1])
    rect_local = jnp.where(
        (ax > ay)[..., None],
        jnp.stack([jnp.sign(local[..., 0]), jnp.zeros_like(ay)], -1),
        jnp.stack([jnp.zeros_like(ax), jnp.sign(local[..., 1])], -1),
    )
    rect_world = jnp.einsum("ij,...j->...i", inv_lin_t, rect_local)
    rect_world = rect_world / jnp.sqrt(jnp.sum(rect_world**2, -1, keepdims=True) + eps)
    rect_n = jnp.concatenate([rect_world, jnp.zeros_like(rect_world[..., :1])], -1)

    # Ellipse: fan interpolation between center (0,0,-1) and radial rim normals.
    r = jnp.sqrt(jnp.sum(local**2, -1, keepdims=True) + eps)
    rhat_world = jnp.einsum("ij,...j->...i", inv_lin_t, local / r)
    rhat_world = rhat_world / jnp.sqrt(jnp.sum(rhat_world**2, -1, keepdims=True) + eps)
    ell_n = jnp.concatenate([r * rhat_world, -(1.0 - r)], -1)

    sprite_n = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), rect_n.shape)

    return jnp.where(kind == SHAPE_RECT, rect_n,
                     jnp.where(kind == SHAPE_ELLIPSE, ell_n, sprite_n))


@functools.partial(jax.jit, static_argnums=(1, 2))
def rasterize(scene: Scene, height: int, width: int) -> GBuffer:
    shapes = scene.shapes
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5)[None, :, None]
    ys = (jnp.arange(height, dtype=jnp.float32) + 0.5)[:, None, None]
    pix = jnp.concatenate([jnp.broadcast_to(xs, (height, width, 1)),
                           jnp.broadcast_to(ys, (height, width, 1))], axis=-1)

    # Clear colors (SimulationCamera.cs:98-107).
    albedo0 = jnp.zeros((height, width, 4), jnp.float32).at[..., 3].set(1.0)
    trans0 = jnp.ones((height, width), jnp.float32)
    normal0 = jnp.zeros((height, width, 4), jnp.float32)

    t_exponent = 100.0 / height

    def draw(i, bufs):
        albedo, trans, normal = bufs
        kind = shapes.kind[i]
        inv = shapes.inv_affine[i]
        local = affine_apply(inv, pix)

        box_cover = jnp.max(jnp.abs(local), axis=-1) <= 1.0
        disk_cover = jnp.sum(local**2, axis=-1) <= 1.0
        cover = jnp.where(kind == SHAPE_ELLIPSE, disk_cover, box_cover)
        cover &= shapes.active[i]

        tex = scene.textures[shapes.tex_index[i]]
        uv = (local + 1.0) * 0.5
        c = sample_bilinear_uv(tex, uv)
        tint = shapes.color[i]

        src_a = c[..., 3] * tint[3]
        src_rgb = c[..., :3] * tint[:3] * src_a[..., None]

        img_density = shapes.density[i] * c[..., 3]
        t = jnp.maximum(0.0, 1.0 - img_density) ** t_exponent

        a = jnp.where(cover[..., None],
                      jnp.concatenate([albedo[..., :3] * (1 - src_a[..., None]) + src_rgb,
                                       albedo[..., 3:] * (1 - src_a[..., None]) + src_a[..., None]], -1),
                      albedo)
        tr = jnp.where(cover, trans * t, trans)

        inv_lin_t = inv[:2, :2].T  # (A^-1)^T applied to local normals
        n3 = _shape_normal(kind, local, inv_lin_t)
        n4 = jnp.concatenate([n3, jnp.full_like(n3[..., :1], shapes.alignment[i])], -1)
        nm = jnp.where(cover[..., None], n4, normal)
        return a, tr, nm

    albedo, trans, normal = jax.lax.fori_loop(
        0, shapes.capacity, draw, (albedo0, trans0, normal0))
    return GBuffer(albedo=albedo, transmissibility=trans, normal=normal)


def _downsample_trans_level(level: jax.Array, variation_epsilon: float) -> jax.Array:
    """One custom transmissibility mip step (GBuffer.compute:31-52).

    Input/output are (h, w, 4) with channels (avg, min, variance, leaf).
    """
    h, w = level.shape[0] // 2, level.shape[1] // 2
    q = level[: h * 2, : w * 2].reshape(h, 2, w, 2, 4).transpose(0, 2, 1, 3, 4)
    a, b = q[..., 0, 0, :], q[..., 0, 1, :]
    c, d = q[..., 1, 0, :], q[..., 1, 1, :]

    average = (a[..., 0] * b[..., 0] + c[..., 0] * d[..., 0]
               + a[..., 0] * c[..., 0] + b[..., 0] * d[..., 0]) / 4.0
    minimum = jnp.minimum(
        jnp.minimum(a[..., 1] * b[..., 1], c[..., 1] * d[..., 1]),
        jnp.minimum(a[..., 1] * c[..., 1], b[..., 1] * d[..., 1]))
    sr_avg = jnp.sqrt(jnp.maximum(average, 0.0))
    var = ((a[..., 0] - sr_avg) ** 2 + (b[..., 0] - sr_avg) ** 2
           + (c[..., 0] - sr_avg) ** 2 + (d[..., 0] - sr_avg) ** 2) * 0.25
    leaf = (var < variation_epsilon).astype(jnp.float32)
    return jnp.stack([average, minimum, var, leaf], axis=-1)


def _neighborhood_variance(level: jax.Array, variation_epsilon: float) -> jax.Array:
    """3x3 variance + leaf flags per mip texel (GBuffer.compute:70-102)."""
    x = level[..., 0]
    padded = jnp.pad(x, 1, mode="edge")
    stack = jnp.stack([padded[dy:dy + x.shape[0], dx:dx + x.shape[1]]
                       for dy in range(3) for dx in range(3)], axis=0)
    mean = stack.mean(axis=0)
    variance = jnp.sqrt(jnp.sum((stack - mean) ** 2, axis=0)) / 3.0
    leaf = (variance < variation_epsilon).astype(jnp.float32)
    return level.at[..., 2].set(variance).at[..., 3].set(leaf)


@functools.partial(jax.jit, static_argnums=(1,))
def build_pyramid(gbuffer: GBuffer, levels: int = 0,
                  variation_epsilon: float = 1e-3) -> GBufferPyramid:
    """Custom transmissibility mips + quadtree-leaf LOD map.

    Mirrors SimulationCamera.OnPostRender (SimulationCamera.cs:111-171):
    downsample each level, run the 3x3 variance pass with epsilon halved per
    level, then resolve per-texel quadtree leaves from the coarsest usable
    level (mipcount - 3) down.
    """
    h, w = gbuffer.transmissibility.shape
    if levels <= 0:
        levels = max(1, min(h, w).bit_length() - 1)

    t0 = jnp.stack([gbuffer.transmissibility, gbuffer.transmissibility,
                    jnp.zeros_like(gbuffer.transmissibility),
                    jnp.ones_like(gbuffer.transmissibility)], axis=-1)
    out = [t0]
    eps = variation_epsilon
    for _ in range(levels):
        eps /= 2.0
        nxt = _downsample_trans_level(out[-1], eps)
        nxt = _neighborhood_variance(nxt, eps)
        out.append(nxt)
        if min(nxt.shape[:2]) <= 1:
            break

    # Quadtree leaves: coarsest level whose leaf flag is set at this texel.
    lowest_lod = max(0, len(out) - 3)
    quad = jnp.zeros((h, w), jnp.float32)
    ys = (jnp.arange(h) + 0.5) / h
    xs = (jnp.arange(w) + 0.5) / w
    found = jnp.zeros((h, w), dtype=bool)
    for lod in range(lowest_lod, -1, -1):
        lvl = out[lod]
        iy = jnp.clip((ys * lvl.shape[0]).astype(jnp.int32), 0, lvl.shape[0] - 1)
        ix = jnp.clip((xs * lvl.shape[1]).astype(jnp.int32), 0, lvl.shape[1] - 1)
        leaf = lvl[iy[:, None], ix[None, :], 3] == 1.0
        quad = jnp.where(~found & leaf, float(lod), quad)
        found |= leaf
    return GBufferPyramid(levels=tuple(out), quadtree=quad)
