"""Scattering and BRDF math (reference: SimulationCommon.cginc:95-385).

All functions are batched over photons and branch-free: every material case
is computed and the result selected by mask, which is the natural TPU
expression of the reference's per-thread divergent branches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.sampling import sample_lut

TWO_PI = 2.0 * jnp.pi


def cross2d(a: jax.Array, b: jax.Array) -> jax.Array:
    """dot(a, (-b.y, b.x)) (LitboxCommon.cginc:94-97)."""
    return a[..., 0] * -b[..., 1] + a[..., 1] * b[..., 0]


def perp(v: jax.Array) -> jax.Array:
    """(-y, x) rotation by +90 degrees."""
    return jnp.stack([-v[..., 1], v[..., 0]], axis=-1)


def unit_from_angle(theta: jax.Array) -> jax.Array:
    return jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)


def scatter_mie(mie_lut: jax.Array, incoming: jax.Array, u: jax.Array) -> jax.Array:
    """Rotate `incoming` by a Mie-LUT-sampled angle (SimulationCommon.cginc:95-101).

    Note the reference's perpendicular here is (y, -x) (perp.x *= -1 after yx
    swizzle), the opposite handedness from ScatterImportanceLobed.
    """
    s = sample_lut(mie_lut, u)
    p = jnp.stack([incoming[..., 1], -incoming[..., 0]], axis=-1)
    return s[..., 0:1] * incoming + s[..., 1:2] * p


def scatter_importance_lobed(teardrop_lut: jax.Array, origin: jax.Array,
                             target: jax.Array, u: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Teardrop lobe toward `target` (SimulationCommon.cginc:103-118).

    Returns (direction (..., 2), inverse-density weight). The base direction
    points away from the target; the teardrop pdf peaks at +-pi, folding the
    samples back toward it.
    """
    d = target - origin
    lsq = jnp.sum(d * d, axis=-1, keepdims=True)
    base = -d / jnp.sqrt(jnp.maximum(lsq, 1e-12))
    s = sample_lut(teardrop_lut, u)
    direction = base * s[..., 0:1] + perp(base) * s[..., 1:2]
    return direction, s[..., 2]


def scatter_importance_guided(pyramid: tuple, origin_uv: jax.Array,
                              rand2: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Hierarchical importance-map sampling (the intent of
    ScatterImportanceGuided / TestImportanceMapPDF,
    SimulationCommon.cginc:145-255).

    The reference's version is dead code (it descends a 2x2 Gather window
    within ~8 map pixels of the origin and its tail returns 0, :253-254).
    This implements the global form: a top-down categorical descent of the
    SUM pyramid from post.importance_pyramid — pick a coarsest-level cell
    proportionally to its energy, then refine through each level's 2x2
    children — yielding points distributed like the radiance map with exact
    inverse-density weights.

    Returns (uv_offset from origin_uv to the sampled point, inverse density
    = uniform_pdf / sample_pdf).
    """
    coarsest = pyramid[-1]
    ch, cw = coarsest.shape
    n = origin_uv.shape[0]
    selector = rand2[..., 0]

    # Coarsest level: categorical over all cells.
    flat = coarsest.reshape(-1)
    cdf = jnp.cumsum(flat)
    total = cdf[-1] + 1e-20
    idx = jnp.searchsorted(cdf, selector * total, side="right")
    idx = jnp.clip(idx, 0, flat.shape[0] - 1)
    lo = jnp.where(idx > 0, cdf[idx - 1], 0.0)
    p_cell = flat[idx] / total
    selector = jnp.clip((selector * total - lo) / jnp.maximum(flat[idx], 1e-20), 0.0, 1.0)
    cy, cx = idx // cw, idx % cw
    inv_density = (1.0 / (ch * cw)) / jnp.maximum(p_cell, 1e-20)

    # Refine through finer levels: 4-way pick among the 2x2 children.
    for level in reversed(pyramid[:-1]):
        lh, lw = level.shape
        cy2, cx2 = cy * 2, cx * 2
        e00 = level[jnp.clip(cy2, 0, lh - 1), jnp.clip(cx2, 0, lw - 1)]
        e01 = level[jnp.clip(cy2, 0, lh - 1), jnp.clip(cx2 + 1, 0, lw - 1)]
        e10 = level[jnp.clip(cy2 + 1, 0, lh - 1), jnp.clip(cx2, 0, lw - 1)]
        e11 = level[jnp.clip(cy2 + 1, 0, lh - 1), jnp.clip(cx2 + 1, 0, lw - 1)]
        tot = e00 + e01 + e10 + e11 + 1e-20
        p0, p1, p2 = e00 / tot, e01 / tot, e10 / tot
        c0, c1, c2 = p0, p0 + p1, p0 + p1 + e10 / tot
        sel = selector
        k0 = sel < c0
        k1 = (~k0) & (sel < c1)
        k2 = (~k0) & (~k1) & (sel < c2)
        k3 = ~(k0 | k1 | k2)
        dx = jnp.where(k1 | k3, 1, 0)
        dy = jnp.where(k2 | k3, 1, 0)
        p_child = jnp.where(k0, p0, jnp.where(k1, p1,
                            jnp.where(k2, p2, e11 / tot)))
        selector = jnp.where(k0, sel / jnp.maximum(c0, 1e-20),
                   jnp.where(k1, (sel - c0) / jnp.maximum(p1, 1e-20),
                   jnp.where(k2, (sel - c1) / jnp.maximum(e10 / tot, 1e-20),
                             (sel - c2) / jnp.maximum(e11 / tot, 1e-20))))
        cy, cx = cy2 + dy, cx2 + dx
        inv_density = inv_density * 0.25 / jnp.maximum(p_child, 1e-20)

    h0, w0 = pyramid[0].shape
    jitter = rand2[..., 1]
    uv = jnp.stack([(cx.astype(jnp.float32) + jitter) / w0,
                    (cy.astype(jnp.float32) + selector) / h0], -1)
    return uv - origin_uv, inv_density


def _hermite_weights(u: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Cubic Hermite basis (SimulationCommon.cginc:270-281)."""
    uu = u * u
    uuu = uu * u
    return (2 * uuu - 3 * uu + 1, uuu - 2 * uu + u, -2 * uuu + 3 * uu, uuu - uu)


def sample_brdf(brdf_lut: jax.Array, normal: jax.Array, reflected: jax.Array,
                roughness: jax.Array, u: jax.Array) -> tuple[jax.Array, jax.Array]:
    """GGX BRDF LUT sample with Hermite interpolation along the random axis
    (StandardBRDF, SimulationCommon.cginc:294-339).

    brdf_lut: (NI, NJ, NK, 4) from core.luts.brdf_lut.
    Returns (unit direction (..., 2), energy scale weight^2).
    """
    ni, nj, nk = brdf_lut.shape[:3]
    v = (cross2d(normal, reflected) + 1.0) / 2.0
    tangent = perp(normal)

    x = jnp.clip(u, 0.0, 1.0) * (ni - 1)
    i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, ni - 2)
    f = x - i0.astype(x.dtype)

    jx = jnp.clip(v, 0.0, 1.0) * (nj - 1)
    j0 = jnp.clip(jnp.floor(jx).astype(jnp.int32), 0, max(nj - 2, 0))
    jf = (jx - j0.astype(jx.dtype))[..., None]
    kx = jnp.clip(roughness, 0.0, 1.0) * (nk - 1)
    k0 = jnp.clip(jnp.floor(kx).astype(jnp.int32), 0, max(nk - 2, 0))
    kf = (kx - k0.astype(kx.dtype))[..., None]

    def fetch(ii):
        v00 = brdf_lut[ii, j0, k0]
        v10 = brdf_lut[ii, jnp.minimum(j0 + 1, nj - 1), k0]
        v01 = brdf_lut[ii, j0, jnp.minimum(k0 + 1, nk - 1)]
        v11 = brdf_lut[ii, jnp.minimum(j0 + 1, nj - 1), jnp.minimum(k0 + 1, nk - 1)]
        return ((v00 * (1 - jf) + v10 * jf) * (1 - kf)
                + (v01 * (1 - jf) + v11 * jf) * kf)

    s1 = fetch(i0)
    s2 = fetch(i0 + 1)
    t1 = jnp.stack([-s1[..., 1], s1[..., 0], jnp.zeros_like(s1[..., 0]),
                    jnp.zeros_like(s1[..., 0])], -1) * s1[..., 2:3]
    t2 = jnp.stack([-s2[..., 1], s2[..., 0], jnp.zeros_like(s2[..., 0]),
                    jnp.zeros_like(s2[..., 0])], -1) * s2[..., 2:3]

    h0, h1, h2, h3 = _hermite_weights(f)
    scattered = (s1 * h0[..., None] + t1 * h1[..., None]
                 + s2 * h2[..., None] + t2 * h3[..., None])

    direction = scattered[..., 0:1] * normal + scattered[..., 1:2] * tangent
    direction = direction / jnp.sqrt(jnp.sum(direction**2, -1, keepdims=True) + 1e-20)
    return direction, scattered[..., 3] ** 2


def sample_brdf_fast(brdf_lut: jax.Array, normal: jax.Array, reflected: jax.Array,
                     roughness: jax.Array, u: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Single-gather nearest-neighbor BRDF sample for the production tracer.

    The accurate path (sample_brdf) costs 8 table gathers per photon; at
    10^6+ photons/frame that dominates the frame (XLA TPU gathers run at
    ~100 M/s). Nearest sampling quantizes the scatter angle to the table's
    128 CDF steps (~1.4 deg) — below the RBT engine's angular bin width.
    """
    ni, nj, nk = brdf_lut.shape[:3]
    flat = brdf_lut.reshape(ni * nj * nk, 4)
    v = (cross2d(normal, reflected) + 1.0) / 2.0
    i = jnp.clip(jnp.round(u * (ni - 1)).astype(jnp.int32), 0, ni - 1)
    j = jnp.clip(jnp.round(v * (nj - 1)).astype(jnp.int32), 0, nj - 1)
    k = jnp.clip(jnp.round(roughness * (nk - 1)).astype(jnp.int32), 0, nk - 1)
    s = flat[(i * nj + j) * nk + k]
    tangent = perp(normal)
    direction = s[..., 0:1] * normal + s[..., 1:2] * tangent
    direction = direction / jnp.sqrt(jnp.sum(direction**2, -1, keepdims=True) + 1e-20)
    return direction, s[..., 3] ** 2


def scatter_materially(brdf_lut: jax.Array, normal4: jax.Array, incoming: jax.Array,
                       rand3: jax.Array, fast: bool = False,
                       enable_brdf: bool = True) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Material dispatch at a bounce point (SimulationCommon.cginc:341-379).

    normal4: (..., 4) sampled normal+alignment field. rand3: (..., 3) uniforms.
    Returns (new_direction, energy_scale, origin_pushback) where pushback is
    the -2.5 * incoming offset the mirror/BRDF branch applies to the origin.

    Branch map (all computed, mask-selected):
      no normal (|n|^2 < 1e-5)     -> uniform direction, scale 1
      normal aligned with incoming -> transmit-as-bounce (direction kept)
      alignment' > 0.999           -> perfect mirror
      alignment' == 0              -> uniform hemisphere about the normal
      else                         -> BRDF LUT sample, scale weight^2
    """
    eps = 1e-5
    n2 = normal4[..., :2]
    alignment = normal4[..., 3]
    len2 = jnp.sum(n2 * n2, axis=-1)

    no_normal = len2 < eps
    transmit = jnp.sum(n2 * incoming, axis=-1) > 0

    length = jnp.sqrt(jnp.maximum(len2, 1e-20))
    nhat = n2 / length[..., None]
    reflected = incoming - 2.0 * jnp.sum(incoming * nhat, -1, keepdims=True) * nhat
    align = jnp.clip(alignment / length, 0.0, 1.0)

    uniform_dir = unit_from_angle(rand3[..., 0] * TWO_PI)
    hemi = jnp.where((jnp.sum(uniform_dir * nhat, -1) > 0)[..., None], uniform_dir, -uniform_dir)
    if enable_brdf:
        brdf_fn = sample_brdf_fast if fast else sample_brdf
        brdf_dir, brdf_scale = brdf_fn(brdf_lut, nhat, reflected, 1.0 - align, rand3[..., 1])
    else:
        # Statically removed when the caller knows no scene shape carries a
        # particle-alignment (BRDF) material — hemisphere fallback.
        brdf_dir, brdf_scale = hemi, jnp.ones_like(align)

    mirror = align > 0.999
    diffuse = align == 0.0

    refl_branch_dir = jnp.where(mirror[..., None], reflected,
                                jnp.where(diffuse[..., None], hemi, brdf_dir))
    refl_branch_scale = jnp.where(mirror | diffuse, 1.0, brdf_scale)

    direction = jnp.where(no_normal[..., None], uniform_dir,
                          jnp.where(transmit[..., None], incoming, refl_branch_dir))
    scale = jnp.where(no_normal | transmit, 1.0, refl_branch_scale)
    pushback = jnp.where((no_normal | transmit)[..., None],
                         jnp.zeros_like(incoming), -incoming * 2.5)
    return direction, scale, pushback
