"""Rotated-bin transport (RBT): the production TPU photon engine.

The oracle tracer (sim/oracle.py) marches every photon texel-by-texel —
hundreds of serial random-access texture gathers per photon, which on TPU
runs at ~100 M gathers/s and caps throughput around 10^4..10^5 photons/s.
RBT restructures the same estimator so the hot path is dense VPU/MXU work:

  * Photon directions are quantized to D angular bins. For each bin the
    log-transmissibility field is resampled into a frame where the bin
    direction is the +x axis (one MXU factorized gather per scene change,
    ops/resample.py), giving per-row cumulative optical depth C[d, y, x].
  * A photon's free flight along its ray becomes operations on ONE row:
    total escape transmittance T_esc = exp(C[end] - C[x0]); the reference's
    distance sampling tp ~ U[T_esc, 1] (ForwardMonteCarlo.compute:209-214)
    inverts to the first column where C drops below C[x0] + ln(tp) — a
    dense compare-and-sum over the row instead of a marching loop.
  * In-scatter deposits (WriteSample, ForwardMonteCarlo.compute:121-128)
    are exact line integrals instead of stratified samples: each photon
    injects its energy at its rotated cell, and a per-row linear recurrence
      O[x] = t[x] * O[x-1] + src[x]
    (jax.lax.associative_scan — numerically stable, no exp overflow)
    deposits the exp-attenuated energy along the entire ray densely.
    This is the analytic-expectation version of the reference's stratified
    estimator: identical converged mean, strictly lower variance per photon.
  * Source injection is linear, so per-frame work is only photon logic;
    the scan and the rotate-back to the target frame are deferred to
    display/convergence time and amortized.

Angular quantization blurs transport tangentially by up to r*2pi/D at
distance r (a cone of one bin width); bins are jittered per frame is NOT
done in v1 — raise n_bins for sharper shadows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import GBuffer, pytree_dataclass
from ..ops.resample import gather_bilinear_mxu
from .emission import assign_photons_to_lights, emit
from .materials import scatter_materially

LOGT_CLAMP = -20.0  # per-texel transmissibility floor e^-20 ~ 2e-9 (opaque)


@pytree_dataclass
class RotatedFields:
    """Per-bin rotated transport fields (frame-constant per scene)."""

    cos: jax.Array       # (D,)
    sin: jax.Array       # (D,)
    trans: jax.Array     # (D, S, S) per-cell transmissibility along rows
    cum_log: jax.Array   # (D, S, S) cumulative log-transmissibility C
    center: jax.Array    # (2,) target-frame center

    @property
    def n_bins(self) -> int:
        return self.cos.shape[0]

    @property
    def size(self) -> int:
        return self.trans.shape[-1]


@functools.partial(jax.jit, static_argnames=("n_bins", "rot_size"))
def precompute_rotated_fields(gbuffer: GBuffer, n_bins: int = 128,
                              rot_size: int = 0) -> RotatedFields:
    height, width = gbuffer.transmissibility.shape
    s = rot_size or int(-(-int(np.ceil((height**2 + width**2) ** 0.5)) // 8) * 8)
    d = n_bins

    angles = jnp.arange(d, dtype=jnp.float32) * (2 * jnp.pi / d)
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    center = jnp.array([width / 2.0, height / 2.0], jnp.float32)

    logt = jnp.log(jnp.clip(gbuffer.transmissibility, np.exp(LOGT_CLAMP), 1.0))

    # Rotated-grid sample points: p = R_d^T (p' - c') + c.  R_d maps the bin
    # direction to +x, so rows of the rotated field are rays of bin d.
    xs = jnp.arange(s, dtype=jnp.float32) + 0.5 - s / 2.0
    rx = xs[None, None, :]
    ry = xs[None, :, None]
    px = cos[:, None, None] * rx - sin[:, None, None] * ry + center[0]
    py = sin[:, None, None] * rx + cos[:, None, None] * ry + center[1]
    points = jnp.stack([px, py], axis=-1).reshape(-1, 2)

    logt_rot = gather_bilinear_mxu(logt, points).reshape(d, s, s)
    return RotatedFields(cos=cos, sin=sin, trans=jnp.exp(logt_rot),
                         cum_log=jnp.cumsum(logt_rot, axis=-1), center=center)


def _row_extract(values: jax.Array, weights: jax.Array) -> jax.Array:
    """sum_x rows[., x] * w[., x] — dense per-photon row reduction."""
    return jnp.sum(values * weights, axis=-1)


@functools.partial(jax.jit, static_argnames=("n_photons", "max_bounces"),
                   donate_argnames=("src_accum",))
def rbt_trace_frame(fields: RotatedFields, src_accum: jax.Array, gbuffer: GBuffer,
                    lights, field_textures, brdf_lut, key,
                    n_photons: int, override_bounces, max_bounces: int = 4):
    """Trace one frame's photons; accumulate sources into src_accum (D,S,S,3).

    Returns (src_accum, photons_emitted). The lightmap itself is produced by
    resolve_lightmap (deferred scan + rotate-back).
    """
    height, width = gbuffer.transmissibility.shape
    d_bins, s = fields.n_bins, fields.size
    bin_width = 2 * jnp.pi / d_bins
    xs = jnp.arange(s, dtype=jnp.float32)

    k_emit, key = jax.random.split(key)
    l_idx, rays_per_light = assign_photons_to_lights(lights, n_photons)
    # interval=1: RBT deposits are exact line integrals; the reference's
    # 1/interval emission factor and interval^2 deposit factor cancel.
    pos, direction, energy, bounces = emit(
        lights, field_textures, l_idx, rays_per_light, k_emit,
        (height, width), jnp.float32(1.0), override_bounces)
    dead = jnp.zeros(n_photons, bool)

    for wave in range(max_bounces):
        key, k_tp, k_scatter = jax.random.split(key, 3)
        live = (~dead) & (wave < bounces)

        theta = jnp.arctan2(direction[:, 1], direction[:, 0])
        b = jnp.round(theta / bin_width).astype(jnp.int32) % d_bins
        ang = b.astype(jnp.float32) * bin_width
        cb = jnp.cos(ang)
        sb = jnp.sin(ang)

        rel = pos - fields.center
        xr = cb * rel[:, 0] + sb * rel[:, 1] + s / 2.0
        yr = -sb * rel[:, 0] + cb * rel[:, 1] + s / 2.0

        # --- source injection (energy at the photon's rotated cell) ---
        ix = jnp.clip(jnp.floor(xr).astype(jnp.int32), 0, s - 1)
        iy = jnp.clip(jnp.floor(yr).astype(jnp.int32), 0, s - 1)
        src_accum = src_accum.at[b, iy, ix].add(
            jnp.where(live[:, None], energy, 0.0))

        # --- free flight on the photon's row ---
        rows = fields.cum_log.reshape(d_bins * s, s)[b * s + iy]   # (N, S)
        tent_x0 = jnp.maximum(0.0, 1.0 - jnp.abs((xr - 0.5)[:, None] - xs))
        c0 = _row_extract(rows, tent_x0)
        c_end = rows[:, -1]
        t_esc = jnp.exp(jnp.clip(c_end - c0, -60.0, 0.0))

        tp = t_esc + jax.random.uniform(k_tp, (n_photons,)) * (1.0 - t_esc)
        thr = c0 + jnp.log(jnp.maximum(tp, 1e-30))
        x_star = jnp.sum((rows >= thr[:, None]).astype(jnp.int32), axis=-1)
        found = live & (x_star < s) & (x_star > 0)
        x_star = jnp.clip(x_star, 1, s - 1)

        c_at = _row_extract(rows, (xs[None, :] == x_star[:, None]).astype(jnp.float32))
        c_prev = _row_extract(rows, (xs[None, :] == (x_star - 1)[:, None]).astype(jnp.float32))
        frac = jnp.clip((c_prev - thr) / (c_prev - c_at - 1e-12), 0.0, 1.0)
        hit_x = x_star.astype(jnp.float32) - 0.5 + frac

        hx = hit_x - s / 2.0
        hy = yr - s / 2.0
        p_hit = jnp.stack([cb * hx - sb * hy, sb * hx + cb * hy], -1) + fields.center

        # --- material scatter at the interaction point ---
        gx = jnp.clip(jnp.floor(p_hit[:, 0]).astype(jnp.int32), 0, width - 1)
        gy = jnp.clip(jnp.floor(p_hit[:, 1]).astype(jnp.int32), 0, height - 1)
        normal4 = gbuffer.normal[gy, gx]
        albedo = gbuffer.albedo[gy, gx, :3]

        rand3 = jax.random.uniform(k_scatter, (n_photons, 3))
        new_dir, mat_scale, pushback = scatter_materially(
            brdf_lut, normal4, direction, rand3)

        quantum_scale = 1.0 - t_esc
        bounced = found
        energy = jnp.where(bounced[:, None],
                           energy * albedo * (quantum_scale * mat_scale)[:, None],
                           energy)
        pos = jnp.where(bounced[:, None], p_hit + pushback + new_dir, pos)
        direction = jnp.where(bounced[:, None], new_dir, direction)
        dead = dead | (live & ~found)

    return src_accum, jnp.int32(n_photons)


@jax.jit
def attenuation_scan(fields: RotatedFields, src_accum: jax.Array) -> jax.Array:
    """Per-row linear recurrence O[x] = t[x]*O[x-1] + src[x] over all bins.

    Numerically stable by construction (t <= 1, no exponentials of
    cumulative depth), unlike the naive exp(C)*cumsum(exp(-C)*src) form.
    """
    t3 = fields.trans[..., None]

    def combine(a, b):
        return (a[0] * b[0], a[1] * b[0] + b[1])

    # Sources are pre-attenuated by HALF their own cell's extinction: a
    # source sits mid-cell on average, so the continuous line integral
    # through cell x is E * sqrt(t[x0]) * prod_{k in (x0, x]} t[k]. (The
    # oracle applies the full source texel — Propagate multiplies before
    # WriteSample — a half-texel-stronger attenuation; the continuous
    # convention splits the difference and matches the closed-form profile.)
    _, deposited = jax.lax.associative_scan(
        combine,
        (jnp.broadcast_to(t3, src_accum.shape), src_accum * jnp.sqrt(t3)), axis=2)
    return deposited


def rotate_back(fields: RotatedFields, deposited: jax.Array,
                height: int, width: int) -> jax.Array:
    """Sum per-bin rotated deposit maps into the target frame."""
    ys, xs = jnp.mgrid[0:height, 0:width]
    p = jnp.stack([xs + 0.5, ys + 0.5], -1).reshape(-1, 2).astype(jnp.float32)
    rel = p - fields.center
    s = fields.size

    def one(args):
        dep_d, cb, sb = args
        xr = cb * rel[:, 0] + sb * rel[:, 1] + s / 2.0
        yr = -sb * rel[:, 0] + cb * rel[:, 1] + s / 2.0
        pts = jnp.stack([xr, yr], -1)
        return gather_bilinear_mxu(dep_d, pts)

    per_bin = jax.lax.map(one, (deposited, fields.cos, fields.sin))
    return per_bin.sum(0).reshape(height, width, 3)


@functools.partial(jax.jit, static_argnames=("height", "width"))
def resolve_raw(fields: RotatedFields, src_accum: jax.Array,
                height: int, width: int) -> jax.Array:
    """Scan + rotate-back in one jitted call -> raw (H, W, 3) deposit map
    (the analog of the oracle's accumulated `raw`; feed to oracle.to_hdr)."""
    deposited = attenuation_scan(fields, src_accum)
    return rotate_back(fields, deposited, height, width)
