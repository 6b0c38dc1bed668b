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
distance r (a cone of one bin width). A fixed bin phase leaves D radial
"spokes" in smooth direct light; passing a per-frame random `phase` to
precompute_rotated_fields rotates the whole bin fan by phase*2pi/D so the
accumulated (or converged) output integrates over the cone and the spokes
average away (the per-frame cost is one field re-rotation + resolve).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import LIGHT_POINT, GBuffer, pytree_dataclass
from ..ops.resample import gather_bilinear_mxu
from .emission import assign_photons_to_lights, emit
from .materials import scatter_materially

LOGT_CLAMP = -20.0  # per-texel transmissibility floor e^-20 ~ 2e-9 (opaque)
COARSE = 16         # free-flight search: coarse subsample stride of C rows


@pytree_dataclass
class RotatedFields:
    """Per-bin rotated transport fields (frame-constant per scene)."""

    cos: jax.Array        # (D,)
    sin: jax.Array        # (D,)
    trans: jax.Array      # (D, S, S) per-cell transmissibility along rows
    cum_log: jax.Array    # (D, S, S) cumulative log-transmissibility C
    cum_coarse: jax.Array # (D, S, S/COARSE) C[..., COARSE-1::COARSE] subsample
    center: jax.Array     # (2,) target-frame center
    phase: jax.Array      # () bin-fan phase offset in bin units, [0, 1)

    @property
    def n_bins(self) -> int:
        return self.cos.shape[0]

    @property
    def size(self) -> int:
        return self.trans.shape[-1]


@functools.partial(jax.jit, static_argnames=("n_bins", "rot_size"))
def precompute_rotated_fields(gbuffer: GBuffer, n_bins: int = 128,
                              rot_size: int = 0,
                              phase: jax.Array | float = 0.0) -> RotatedFields:
    """phase (traced, bin units in [0, 1)) rotates the whole bin fan by
    phase*2pi/n_bins — pass a fresh random phase per frame to dither away
    the D-spoke angular quantization in accumulated output."""
    height, width = gbuffer.transmissibility.shape
    # Rounded to a multiple of 128 so the rotation shear kernels never pad
    # (lane alignment) — worth ~9% memory for copy-free shears.
    s = rot_size or int(-(-int(np.ceil((height**2 + width**2) ** 0.5)) // 128) * 128)
    d = n_bins

    phase = jnp.asarray(phase, jnp.float32)
    angles = (jnp.arange(d, dtype=jnp.float32) + phase) * (2 * jnp.pi / d)
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
    cum_log = jnp.cumsum(logt_rot, axis=-1)
    return RotatedFields(cos=cos, sin=sin, trans=jnp.exp(logt_rot),
                         cum_log=cum_log,
                         cum_coarse=cum_log[..., COARSE - 1::COARSE],
                         center=center, phase=phase)


def _inject_flat(src_accum: tuple, flat_idx: jax.Array, energy: jax.Array) -> tuple:
    """Scatter-add photon energies at flat cell indices into the per-channel
    source buffers (3 x (D, S, S)).

    Channel-major layout keeps each scatter a contiguous in-place flat add:
    XLA's multi-channel window scatter is ~3x slower on v5e, and channel-last
    layout forces strided column gathers plus full-buffer restacks (~10 ms
    per 1M updates per channel is the HBM random read-modify-write limit).
    """
    out = []
    for c in range(3):
        ch = src_accum[c]
        out.append(ch.reshape(-1).at[flat_idx].add(energy[:, c]).reshape(ch.shape))
    return tuple(out)


def zero_sources(fields: RotatedFields) -> tuple:
    """Fresh per-channel source buffers (3 x (D, S, S))."""
    d, s = fields.n_bins, fields.size
    return tuple(jnp.zeros((d, s, s)) for _ in range(3))


ANALYTIC_STAMP = 16  # disk stamp width; point lights with radius > stamp/2-1 fall back to MC


def analytic_light_mask(lights) -> jax.Array:
    """(L,) True for lights whose wave-0 deposits are injected analytically."""
    radius = jnp.sqrt(jnp.abs(
        lights.affine[:, 0, 0] * lights.affine[:, 1, 1]
        - lights.affine[:, 0, 1] * lights.affine[:, 1, 0]))
    return ((lights.kind == LIGHT_POINT) & lights.active
            & (radius < ANALYTIC_STAMP / 2 - 1) & (lights.bounces != 0))


def _analytic_point_sources(src_accum: jax.Array, lights, light_mask,
                            fields: RotatedFields, pixel_count: float):
    """Noise-free direct-light injection for point lights.

    A point light emits uniformly over a disk with isotropic directions, so
    its EXPECTED per-bin wave-0 source field is deterministic:
    total_energy/(2 pi D) times the disk's coverage density at the light's
    rotated center. Replacing the wave-0 Monte Carlo injection with this
    exact mean makes direct lighting zero-variance and cuts the per-photon
    scatter traffic roughly in half.
    """
    d_bins, s = fields.n_bins, fields.size
    capacity = lights.capacity
    stamp = ANALYTIC_STAMP
    two_pi = 2.0 * jnp.pi

    offs = jnp.arange(stamp, dtype=jnp.float32) - stamp / 2 + 0.5
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    rr = jnp.sqrt(ox**2 + oy**2)
    ang = (jnp.arange(d_bins, dtype=jnp.float32) + fields.phase) * (two_pi / d_bins)
    cb, sb = jnp.cos(ang), jnp.sin(ang)

    all_flat, all_vals = [], []
    for li in range(capacity):
        enabled = light_mask[li]
        radius = jnp.sqrt(jnp.abs(
            lights.affine[li, 0, 0] * lights.affine[li, 1, 1]
            - lights.affine[li, 0, 1] * lights.affine[li, 1, 0]))
        center = lights.affine[li, :, 2]

        cover = jnp.clip(radius + 0.5 - rr, 0.0, 1.0)
        cover = cover / jnp.maximum(cover.sum(), 1e-12)

        # Total emitted energy matches emit() with interval=1:
        # per-photon E = energy*(W*H)/(rays*2pi), times rays, over D bins.
        per_bin = lights.energy[li] * (pixel_count / (two_pi * d_bins))

        rel = center - fields.center
        cx = cb * rel[0] + sb * rel[1] + s / 2.0
        cy = -sb * rel[0] + cb * rel[1] + s / 2.0
        iy = jnp.clip((cy[:, None, None] + oy[None]).astype(jnp.int32), 0, s - 1)
        ix = jnp.clip((cx[:, None, None] + ox[None]).astype(jnp.int32), 0, s - 1)
        flat = (jnp.arange(d_bins, dtype=jnp.int32)[:, None, None] * s + iy) * s + ix

        vals = (jnp.where(enabled, 1.0, 0.0)
                * cover[None, :, :, None] * per_bin[None, None, None, :])
        all_flat.append(flat.reshape(-1))
        all_vals.append(jnp.broadcast_to(vals, (d_bins, stamp, stamp, 3)).reshape(-1, 3))

    return _inject_flat(src_accum, jnp.concatenate(all_flat),
                        jnp.concatenate(all_vals))


@functools.partial(jax.jit, static_argnames=(
    "n_photons", "max_bounces", "analytic_direct", "bounce_photons",
    "mc_direct", "enable_brdf", "light_kinds"),
    donate_argnames=("src_accum",))
def rbt_trace_frame(fields: RotatedFields, src_accum: jax.Array, gbuffer: GBuffer,
                    lights, field_textures, brdf_lut, key,
                    n_photons: int, override_bounces, max_bounces: int = 4,
                    analytic_direct: bool = True, bounce_photons: int = 0,
                    mc_direct: bool = True, enable_brdf: bool = True,
                    light_kinds: tuple | None = None):
    """Trace one frame's photons; accumulate sources into src_accum (D,S,S,3).

    Returns (src_accum, photons_emitted); src_accum is the per-channel
    source buffer tuple (3 x (D, S, S)). The lightmap itself is produced by
    resolve_raw (deferred scan + rotate-back). With analytic_direct,
    point lights' wave-0 deposits are injected as their exact expectation
    (zero direct-light noise); their photons still trace for bounce waves.

    bounce_photons > 0 enables Russian-roulette culling after wave 0: a
    strided 1-in-(N/K) systematic subsample survives with energy scaled by
    N/K (photons are exchangeable within each light's contiguous block, so
    strided selection is unbiased). Bounce lighting is low-frequency, so a
    fraction of the direct-wave photon count suffices, and the per-wave
    scatter-injection cost (the HBM random-RMW bound) drops with it.
    """
    height, width = gbuffer.transmissibility.shape
    d_bins, s = fields.n_bins, fields.size
    bin_width = 2 * jnp.pi / d_bins

    k_emit, key = jax.random.split(key)
    # With all-analytic direct lighting only the bounce-chain photons do any
    # work, so emit exactly that many (identical in distribution to emitting
    # n_photons and Russian-roulette culling — photons are exchangeable and
    # per-photon energy renormalizes to the emitted count).
    n_emit = (bounce_photons if (not mc_direct and 0 < bounce_photons < n_photons)
              else n_photons)
    culling = mc_direct and 0 < bounce_photons < n_emit
    l_idx, rays_per_light = assign_photons_to_lights(
        lights, n_emit,
        interleave=n_emit // bounce_photons if culling else 1)
    # interval=1: RBT deposits are exact line integrals; the reference's
    # 1/interval emission factor and interval^2 deposit factor cancel.
    pos, direction, energy, bounces = emit(
        lights, field_textures, l_idx, rays_per_light, k_emit,
        (height, width), jnp.float32(1.0), override_bounces,
        active_kinds=light_kinds)
    dead = jnp.zeros(n_emit, bool)

    if analytic_direct:
        light_mask = analytic_light_mask(lights)
        analytic_mask = light_mask[l_idx]
        src_accum = _analytic_point_sources(src_accum, lights, light_mask,
                                            fields, float(width * height))
    else:
        analytic_mask = jnp.zeros(n_photons, bool)

    def cull(arrs, keep):
        # Contiguous prefix: emission ranks are pre-permuted (see
        # _interleave_ranks) so photons are light-stratified by position and
        # a prefix slice is an unbiased systematic subsample. A strided
        # slice here instead costs ~60 ms at 2M photons (XLA re-fuses each
        # slice into its full producer chain).
        stride = arrs[0].shape[0] // keep
        return [a[:keep] for a in arrs], jnp.float32(stride)

    # One packed material field -> one gather per photon per wave instead
    # of two (XLA TPU gathers are the per-photon cost floor).
    material = jnp.concatenate([gbuffer.normal, gbuffer.albedo[..., :3]], -1)

    for wave in range(max_bounces):
        n = pos.shape[0]
        key, k_tp, k_scatter = jax.random.split(key, 3)
        live = (~dead) & (wave < bounces)

        theta = jnp.arctan2(direction[:, 1], direction[:, 0])
        b = jnp.round(theta / bin_width - fields.phase).astype(jnp.int32) % d_bins
        ang = (b.astype(jnp.float32) + fields.phase) * bin_width
        cb = jnp.cos(ang)
        sb = jnp.sin(ang)

        rel = pos - fields.center
        xr = cb * rel[:, 0] + sb * rel[:, 1] + s / 2.0
        yr = -sb * rel[:, 0] + cb * rel[:, 1] + s / 2.0

        # --- source injection (energy at the photon's rotated cell) ---
        # mc_direct=False statically removes the wave-0 scatter when the
        # caller knows every light is analytically injected (the scatter
        # cost is paid even for all-masked updates otherwise).
        ix = jnp.clip(jnp.floor(xr).astype(jnp.int32), 0, s - 1)
        iy = jnp.clip(jnp.floor(yr).astype(jnp.int32), 0, s - 1)
        if wave > 0 or mc_direct:
            inject = live if wave > 0 else live & ~analytic_mask
            flat = (b * s + iy) * s + ix
            e_masked = jnp.where(inject[:, None], energy, 0.0)
            import os

            if jax.default_backend() == "tpu" and os.environ.get("LITBOX_INJECT_SORTED"):
                # Pallas sorted-merge scatter (ops/inject.py). Kept opt-in:
                # measured 50 ms vs 20 ms for XLA's flat scatter at 2M
                # updates on v5e-lite (the 9216-step grid's fixed overhead
                # dominates its bandwidth win at this target size).
                from ..ops.inject import inject_sorted

                flat_m = jnp.where(inject, flat, jnp.iinfo(jnp.int32).max)
                src_accum = inject_sorted(src_accum, flat_m, e_masked)
            else:
                src_accum = _inject_flat(src_accum, flat, e_masked)

        # --- free flight on the photon's row ---
        # Full (N, S) row gathers run at HBM bandwidth on TPU (~8 ms for 2M
        # x 384 rows); narrow 32-wide gathers from the same table measured
        # 300x slower (latency-bound — no gather unit), so the dense
        # row-reduction formulation wins despite touching S times more data.
        xs = jnp.arange(s, dtype=jnp.float32)
        rows = fields.cum_log.reshape(d_bins * s, s)[b * s + iy]   # (N, S)
        tent_x0 = jnp.maximum(0.0, 1.0 - jnp.abs((xr - 0.5)[:, None] - xs))
        c0 = jnp.sum(rows * tent_x0, axis=-1)
        c_end = rows[:, -1]
        t_esc = jnp.exp(jnp.clip(c_end - c0, -60.0, 0.0))

        tp = t_esc + jax.random.uniform(k_tp, (n,)) * (1.0 - t_esc)
        thr = c0 + jnp.log(jnp.maximum(tp, 1e-30))
        x_star = jnp.sum((rows >= thr[:, None]).astype(jnp.int32), axis=-1)
        found = live & (x_star < s) & (x_star > 0)
        x_star = jnp.clip(x_star, 1, s - 1)

        c_at = jnp.sum(jnp.where(xs[None, :] == x_star[:, None].astype(jnp.float32),
                                 rows, 0.0), axis=-1)
        c_prev = jnp.sum(jnp.where(xs[None, :] == (x_star - 1)[:, None].astype(jnp.float32),
                                   rows, 0.0), axis=-1)
        frac = jnp.clip((c_prev - thr) / (c_prev - c_at - 1e-12), 0.0, 1.0)
        hit_x = x_star.astype(jnp.float32) - 0.5 + frac

        hx = hit_x - s / 2.0
        hy = yr - s / 2.0
        p_hit = jnp.stack([cb * hx - sb * hy, sb * hx + cb * hy], -1) + fields.center

        if wave == max_bounces - 1:
            break  # the last wave's deposits are in; no continuation needed

        # Russian-roulette culling happens BEFORE the material gather: the
        # full batch had to fly (its wave deposits are the signal) but only
        # the survivors need a material lookup and scatter — at 2M-photon
        # frames with 4x culling this removes 3/4 of the most
        # gather-bound stage (strided systematic subsampling is unbiased;
        # photons are exchangeable within each light's contiguous block).
        if wave == 0 and mc_direct and 0 < bounce_photons < n:
            (pos, direction, energy, bounces, dead,
             p_hit, found, t_esc, live), scale = cull(
                [pos, direction, energy, bounces, dead,
                 p_hit, found, t_esc, live], bounce_photons)
            energy = energy * scale

        # --- material scatter at the interaction point ---
        m = pos.shape[0]
        gx = jnp.clip(jnp.floor(p_hit[:, 0]).astype(jnp.int32), 0, width - 1)
        gy = jnp.clip(jnp.floor(p_hit[:, 1]).astype(jnp.int32), 0, height - 1)
        mat = material[gy, gx]
        normal4 = mat[:, :4]
        albedo = mat[:, 4:7]

        rand3 = jax.random.uniform(k_scatter, (m, 3))
        new_dir, mat_scale, pushback = scatter_materially(
            brdf_lut, normal4, direction, rand3, fast=True, enable_brdf=enable_brdf)

        quantum_scale = 1.0 - t_esc
        bounced = found
        energy = jnp.where(bounced[:, None],
                           energy * albedo * (quantum_scale * mat_scale)[:, None],
                           energy)
        pos = jnp.where(bounced[:, None], p_hit + pushback + new_dir, pos)
        direction = jnp.where(bounced[:, None], new_dir, direction)
        dead = dead | (live & ~found)

    return src_accum, jnp.int32(n_emit)


@jax.jit
def attenuation_scan(fields: RotatedFields, src_accum: tuple) -> jax.Array:
    """Per-row linear recurrence O[x] = t[x]*O[x-1] + src[x] over all bins.

    Numerically stable by construction (t <= 1, no exponentials of
    cumulative depth), unlike the naive exp(C)*cumsum(exp(-C)*src) form.
    Returns deposits stacked channel-last (D, S, S, 3).
    """
    t = fields.trans
    sqrt_t = jnp.sqrt(t)

    def combine(a, b):
        return (a[0] * b[0], a[1] * b[0] + b[1])

    # Sources are pre-attenuated by HALF their own cell's extinction: a
    # source sits mid-cell on average, so the continuous line integral
    # through cell x is E * sqrt(t[x0]) * prod_{k in (x0, x]} t[k]. (The
    # oracle applies the full source texel — Propagate multiplies before
    # WriteSample — a half-texel-stronger attenuation; the continuous
    # convention splits the difference and matches the closed-form profile.)
    channels = []
    for c in range(3):
        _, dep = jax.lax.associative_scan(
            combine, (t, src_accum[c] * sqrt_t), axis=2)
        channels.append(dep)
    return jnp.stack(channels, axis=-1)


def rotate_back(fields: RotatedFields, deposited: jax.Array,
                height: int, width: int,
                traced_phase: bool = False) -> jax.Array:
    """Sum per-bin rotated deposit maps into the target frame.

    On TPU: Pallas 3-shear rotation (ops/rotate.py), bandwidth-bound.
    Elsewhere: factorized tent-matmul resample per bin (P x S @ S x S*3 on
    the MXU, ~50 ms at 256^2/128 bins) — also the numerical reference the
    shear path is validated against.

    traced_phase=True routes the TPU path through the traced-angle shear
    rotation so a per-frame jittered fields.phase works under one jit (the
    static path bakes phase=0 angles into the kernel schedule).
    """
    if jax.default_backend() == "tpu":
        from ..ops.rotate import rotate_bins, rotate_bins_uniform

        s = fields.size
        d = fields.n_bins
        # The matmul path samples with R(-theta_d); rotate_bins' convention
        # is R(+a), so a = -theta_d (validated against the matmul path).
        if traced_phase:
            angles = -(jnp.arange(d, dtype=jnp.float32) + fields.phase) * (2.0 * np.pi / d)
            rotated = rotate_bins(deposited, angles)
        else:
            angles = [-i * 2.0 * np.pi / d for i in range(d)]
            rotated = rotate_bins_uniform(deposited, tuple(angles))
        oy = (s - height) // 2
        ox = (s - width) // 2
        return rotated.sum(0)[oy:oy + height, ox:ox + width]
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


@functools.partial(jax.jit, static_argnames=("height", "width", "traced_phase"))
def resolve_raw(fields: RotatedFields, src_accum: jax.Array,
                height: int, width: int, traced_phase: bool = False) -> jax.Array:
    """Scan + rotate-back in one jitted call -> raw (H, W, 3) deposit map
    (the analog of the oracle's accumulated `raw`; feed to oracle.to_hdr)."""
    deposited = attenuation_scan(fields, src_accum)
    return rotate_back(fields, deposited, height, width, traced_phase=traced_phase)
