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

from ..core.types import (
    LIGHT_DIRECTIONAL,
    LIGHT_LASER,
    LIGHT_POINT,
    GBuffer,
    affine_linear,
    pytree_dataclass,
)
from ..ops.resample import gather_bilinear_mxu
from .emission import (
    assign_photons_to_lights,
    emit,
    emit_point_stratified,
    take_per_light,
)
from .materials import TWO_PI, scatter_materially, unit_from_angle

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

    This IS the production injection path (the TPU translation of the
    reference's InterlockedAdd writes, ForwardMonteCarlo.compute:68-105).
    A Pallas sorted-merge alternative (sort records by cell, stream the
    target once, accumulate with one-hot matmuls) was built and priced
    on-chip in round 3: 36.4 ms vs 12.4 ms here at 524K updates into a
    (128, 384, 384) field on v5e — the record sort plus full-target
    streaming costs ~3x more than XLA's native scatter, so it was deleted
    (see NOTES_ROUND3.md).
    """
    out = []
    for c in range(3):
        ch = src_accum[c]
        out.append(ch.reshape(-1).at[flat_idx].add(energy[:, c]).reshape(ch.shape))
    return tuple(out)


def zero_sources(fields: RotatedFields, n_tracers: int = 1) -> tuple:
    """Fresh per-channel source buffers (3 x (T*D, S, S), tracer-major).

    n_tracers > 1 lays the dual-tracer pair's sources out as one buffer
    with a leading tracer axis flattened into the bin axis — the native
    layout of rbt_trace_frame(n_tracers=T), which traces every tracer's
    photons in ONE combined batch (tracer identity only offsets the
    deposit bin block) and pays the frame's fixed costs once instead of
    once per tracer."""
    d, s = fields.n_bins, fields.size
    return tuple(jnp.zeros((n_tracers * d, s, s)) for _ in range(3))


ANALYTIC_STAMP = 16  # disk stamp width; point lights with radius > stamp/2-1 fall back to MC


def _effective_bounces(lights, override_bounces) -> jax.Array:
    """Per-light bounce count with Simulation.photon_bounces folded in
    (override >= 0 replaces every light's own count, emission.py)."""
    if override_bounces is None:
        return lights.bounces
    override = jnp.asarray(override_bounces, jnp.int32)
    return jnp.where(override >= 0, override, lights.bounces)


def analytic_light_mask(lights, override_bounces=None) -> jax.Array:
    """(L,) True for lights whose wave-0 deposits are injected analytically."""
    radius = jnp.sqrt(jnp.abs(
        lights.affine[:, 0, 0] * lights.affine[:, 1, 1]
        - lights.affine[:, 0, 1] * lights.affine[:, 1, 0]))
    return ((lights.kind == LIGHT_POINT) & lights.active
            & (radius < ANALYTIC_STAMP / 2 - 1)
            & (_effective_bounces(lights, override_bounces) != 0))


def _analytic_point_deposits(lights, light_mask, fields: RotatedFields,
                             pixel_count: float, n_tracers: int = 1):
    """Noise-free direct-light deposit stream for point lights.

    A point light emits uniformly over a disk with isotropic directions, so
    its EXPECTED per-bin wave-0 source field is deterministic:
    total_energy/(2 pi D) times the disk's coverage density at the light's
    rotated center. Replacing the wave-0 Monte Carlo injection with this
    exact mean makes direct lighting zero-variance and cuts the per-photon
    scatter traffic roughly in half.

    Returns (flat_idx, values): rbt_trace_frame concatenates every phase's
    deposit stream into ONE _inject_flat call — each scatter into the
    (D, S, S) planes costs ~3.5-5 ms at S=640 nearly independent of update
    count (full-target bound, /tmp prof r3), so one inject per frame, not
    one per phase.
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

    flat = jnp.concatenate(all_flat)
    vals = jnp.concatenate(all_vals)
    if n_tracers > 1:
        # The analytic expectation is deterministic — every tracer's field
        # receives the same per-frame rate at its own bin block.
        offs = jnp.arange(n_tracers, dtype=jnp.int32) * (d_bins * s * s)
        flat = (flat[None, :] + offs[:, None]).reshape(-1)
        vals = jnp.tile(vals, (n_tracers, 1))
    return flat, vals


def collimated_light_mask(lights, override_bounces=None) -> jax.Array:
    """(L,) True for lights whose wave-0 deposits are computed exactly along
    their true direction (collimated sources: lasers and directional
    lights — both emit parallel rays, ForwardMonteCarlo.compute:243-251,
    282-294, so their expected direct field is a single-direction
    attenuation recurrence with no D-bin angular quantization)."""
    return (((lights.kind == LIGHT_LASER) | (lights.kind == LIGHT_DIRECTIONAL))
            & lights.active
            & (_effective_bounces(lights, override_bounces) != 0))


@functools.partial(jax.jit, static_argnames=("height", "width", "rot_size"))
def _laser_direct_raw(gbuffer: GBuffer, affine: jax.Array, energy: jax.Array,
                      height: int, width: int, rot_size: int = 0) -> jax.Array:
    """Exact wave-0 deposit field of ONE collimated light (H, W, 3).

    A collimated light's rays are parallel, so its expected direct-light
    field obeys a 1D attenuation recurrence ALONG THE EXACT BEAM DIRECTION —
    computable with the existing RBT machinery as a one-bin rotated field at
    the light's own angle (instead of snapping to the D-bin fan): rasterize
    the emitting rect's coverage on the rotated grid analytically, scan,
    rotate back. Zero variance AND zero angular quantization: D-bin MC
    collimated lights show a one-bin-wide fan (~2pi/D) under the jitter
    ladder; this kills it. Energy matches the MC path: total injected =
    energy * W * H (the emit() convention at interval=1, emission.py).

    The emitting rect is the affine's local x in [-1/2, 1/2], y in [0, 1]
    (laser_origin, emission.py:116) with flight direction -affine[:, 1];
    directional lights pass a synthesized affine for their entry segment
    (_directional_affine) plus a rot_size large enough to contain it
    (the segment sits a full frame outside the target, emission.py:151;
    outside-of-frame texels are vacuum — gather_bilinear_mxu zero-pads,
    so log-transmissibility is 0 there).
    """
    d = -affine[:, 1]
    d = d / jnp.maximum(jnp.linalg.norm(d), 1e-12)
    theta = jnp.arctan2(d[1], d[0])
    fields = precompute_rotated_fields(gbuffer, n_bins=1, rot_size=rot_size,
                                       phase=theta / (2.0 * jnp.pi))
    s = fields.size

    # Rotated-grid points in target-frame coordinates (as in precompute).
    xs = jnp.arange(s, dtype=jnp.float32) + 0.5 - s / 2.0
    cb, sb = fields.cos[0], fields.sin[0]
    px = cb * xs[None, :] - sb * xs[:, None] + fields.center[0]
    py = sb * xs[None, :] + cb * xs[:, None] + fields.center[1]

    # Analytic antialiased coverage of the emitting rect: local frame is
    # x in [-1/2, 1/2], y in [0, 1] (laser_origin, emission.py:116).
    lin = affine[:, :2]
    det = lin[0, 0] * lin[1, 1] - lin[0, 1] * lin[1, 0]
    inv = jnp.array([[lin[1, 1], -lin[0, 1]], [-lin[1, 0], lin[0, 0]]]) / jnp.where(
        jnp.abs(det) < 1e-12, 1e-12, det)
    rx = px - affine[0, 2]
    ry = py - affine[1, 2]
    lx = inv[0, 0] * rx + inv[0, 1] * ry
    ly = inv[1, 0] * rx + inv[1, 1] * ry
    g0 = jnp.maximum(jnp.linalg.norm(inv[0]), 1e-12)   # |grad lx| per texel
    g1 = jnp.maximum(jnp.linalg.norm(inv[1]), 1e-12)
    cov = (jnp.clip((0.5 - jnp.abs(lx)) / g0 + 0.5, 0.0, 1.0)
           * jnp.clip((0.5 - jnp.abs(ly - 0.5)) / g1 + 0.5, 0.0, 1.0))

    total = energy * jnp.float32(width * height)
    src = cov[None] / jnp.maximum(cov.sum(), 1e-12)
    deposited = attenuation_scan(
        fields, tuple(src * total[c] for c in range(3)))
    # traced_phase: the field's angle lives in fields.phase; the static
    # rotate-back path would bake a 0-degree schedule for a 1-bin fan.
    return rotate_back(fields, deposited, height, width, traced_phase=True)


def _directional_affine(affine: np.ndarray, height: int,
                        width: int) -> tuple[np.ndarray, int]:
    """Synthesize the emitting-rect affine (and the rotated-field size that
    contains it) for a directional light's entry segment.

    EmitDirectionalLight (ForwardMonteCarlo.compute:282-294, mirrored in
    emission.py:147-152) emits origins on the pixel-space segment
        p(t) = (0.5 - dl + t * dperp) * size,  t in [-0.7075, 0.7075]
    flying along dl.  _laser_direct_raw's local frame (x in [-1/2, 1/2]
    across the beam, y in [0, 1] along -direction) expresses that segment as
    columns [1.415 * dperp * size, -dl, p(0)]: a 1-texel-deep rect whose
    normalized coverage IS the emission density (absolute thickness cancels
    in the cov/cov.sum() normalization)."""
    size = np.array([width, height], np.float64)
    dl = -affine[:, 1]
    dl = dl / max(np.linalg.norm(dl), 1e-12)
    dperp = np.array([dl[1], -dl[0]])
    col0 = 1.415 * dperp * size
    center = (0.5 - dl) * size
    synth = np.stack([col0, -dl, center], axis=1).astype(np.float32)

    # The rotated field must contain both the frame and the segment.
    half_span = max(
        float(np.linalg.norm(center - 0.5 * size) + 0.5 * np.linalg.norm(col0)),
        0.5 * float(np.hypot(height, width))) + 2.0
    rot_size = int(-(-int(np.ceil(2.0 * half_span)) // 256) * 256)
    return synth, rot_size


def collimated_direct_raw(gbuffer: GBuffer, lights, height: int,
                          width: int, override_bounces=None) -> jax.Array | None:
    """Sum of exact wave-0 fields for all collimated lights (host-side
    per-scene precompute; None when the scene has none)."""
    mask = np.asarray(collimated_light_mask(lights, override_bounces))
    if not mask.any():
        return None
    kinds = np.asarray(lights.kind)
    total = jnp.zeros((height, width, 3))
    for li in np.nonzero(mask)[0]:
        affine = np.asarray(lights.affine[int(li)])
        rot_size = 0
        if kinds[int(li)] == LIGHT_DIRECTIONAL:
            affine, rot_size = _directional_affine(affine, height, width)
        total = total + _laser_direct_raw(
            gbuffer, jnp.asarray(affine), lights.energy[int(li)],
            height, width, rot_size=rot_size)
    return total


def _rotated_coords(fields: RotatedFields, pos: jax.Array,
                    cb: jax.Array, sb: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Target-frame position -> (xr, yr) in the bin frame of angle (cb, sb)."""
    s = fields.size
    rel = pos - fields.center
    xr = cb * rel[..., 0] + sb * rel[..., 1] + s / 2.0
    yr = -sb * rel[..., 0] + cb * rel[..., 1] + s / 2.0
    return xr, yr


def _row_flight_math(rows: jax.Array, xr: jax.Array, u_tp: jax.Array,
                     live: jax.Array, s: int):
    """Distance-sampled free flight on extracted cum-log rows (..., S).

    The reference's free-flight sampling tp ~ U[T_esc, 1]
    (ForwardMonteCarlo.compute:209-214) inverts to the first column where
    C drops below C[x0] + ln(tp): a dense compare-count over the row
    (C is non-increasing, so the count IS the searchsorted index).
    Returns (hit_x, t_esc, found).
    """
    xs = jnp.arange(s, dtype=jnp.float32)
    tent_x0 = jnp.maximum(0.0, 1.0 - jnp.abs((xr - 0.5)[..., None] - xs))
    c0 = jnp.sum(rows * tent_x0, axis=-1)
    c_end = rows[..., -1]
    t_esc = jnp.exp(jnp.clip(c_end - c0, -60.0, 0.0))

    tp = t_esc + u_tp * (1.0 - t_esc)
    thr = c0 + jnp.log(jnp.maximum(tp, 1e-30))
    x_star = jnp.sum((rows >= thr[..., None]).astype(jnp.int32), axis=-1)
    found = live & (x_star < s) & (x_star > 0)
    x_star = jnp.clip(x_star, 1, s - 1)

    xsf = x_star.astype(jnp.float32)
    c_at = jnp.sum(jnp.where(xs == xsf[..., None], rows, 0.0), axis=-1)
    c_prev = jnp.sum(jnp.where(xs == (xsf - 1.0)[..., None], rows, 0.0), axis=-1)
    frac = jnp.clip((c_prev - thr) / (c_prev - c_at - 1e-12), 0.0, 1.0)
    hit_x = xsf - 0.5 + frac
    return hit_x, t_esc, found


def _flight_rows(fields: RotatedFields, pos: jax.Array, direction: jax.Array,
                 live: jax.Array, u_tp: jax.Array):
    """Generic free flight for a flat photon batch with arbitrary directions.

    Row extraction is an XLA row gather from the (D*S, S) table — HBM
    bandwidth/latency-bound (~8 ms at 524K photons on v5e). Used for bounce
    waves >= 1 where directions are scattered; wave 0 uses the sort-free
    stratified path (_flight_stratified) when emission can pre-bin photons.
    """
    d_bins, s = fields.n_bins, fields.size
    bin_width = 2 * jnp.pi / d_bins
    theta = jnp.arctan2(direction[:, 1], direction[:, 0])
    b = jnp.round(theta / bin_width - fields.phase).astype(jnp.int32) % d_bins
    ang = (b.astype(jnp.float32) + fields.phase) * bin_width
    cb, sb = jnp.cos(ang), jnp.sin(ang)

    xr, yr = _rotated_coords(fields, pos, cb, sb)
    iy = jnp.clip(jnp.floor(yr).astype(jnp.int32), 0, s - 1)
    rows = fields.cum_log.reshape(d_bins * s, s)[b * s + iy]   # (N, S)
    hit_x, t_esc, found = _row_flight_math(rows, xr, u_tp, live, s)

    hx = hit_x - s / 2.0
    hy = yr - s / 2.0
    p_hit = jnp.stack([cb * hx - sb * hy, sb * hx + cb * hy], -1) + fields.center
    return p_hit, t_esc, found


def _flight_stratified(fields: RotatedFields, pos: jax.Array, live: jax.Array,
                       u_tp: jax.Array):
    """Free flight for a direction-stratified (D, cap) photon layout.

    Photons of scan step d are in bin d by construction (emit_point_
    stratified), so row extraction is a one-hot matmul against the bin's
    (S, S) cum-log block — MXU work at ~2.5 ms per 524K photons on v5e vs
    ~8 ms for the XLA row gather ("the MXU is the TPU's gather unit").
    f32 matmul: measured within 6% of bf16 here, and the cum-log dynamic
    range (|C| up to ~LOGT_CLAMP*S) makes bf16 thresholds unsafe.
    """
    s = fields.size

    def per_bin(_, args):
        cum_d, cb, sb, pos_d, live_d, u_d = args
        xr, yr = _rotated_coords(fields, pos_d, cb, sb)
        iy = jnp.clip(jnp.floor(yr).astype(jnp.int32), 0, s - 1)
        rows = jnp.dot(jax.nn.one_hot(iy, s, dtype=jnp.float32), cum_d,
                       preferred_element_type=jnp.float32)
        hit_x, t_esc, found = _row_flight_math(rows, xr, u_d, live_d, s)
        hx = hit_x - s / 2.0
        hy = yr - s / 2.0
        p_hit = (jnp.stack([cb * hx - sb * hy, sb * hx + cb * hy], -1)
                 + fields.center)
        return 0, (p_hit, t_esc, found)

    _, (p_hit, t_esc, found) = jax.lax.scan(
        per_bin, 0,
        (fields.cum_log, fields.cos, fields.sin, pos, live, u_tp))
    return p_hit, t_esc, found


def _mc_point_hist_deposits(lights, fields: RotatedFields,
                            n_photons: int, key, override_bounces,
                            pixel_count: float, n_tracers: int = 1):
    """Monte-Carlo direct deposit stream for all-point-light scenes,
    aggregated as a per-(bin, light) stamp histogram instead of a 2M-wide
    scatter. Returns (flat_idx, values, n_emitted).

    Each of the n photons samples its disk position and direction bin
    individually (directions bin-stratified, see emit_point_stratified);
    because a point light's wave-0 cells all land inside a STAMP-wide bbox
    around its rotated center, per-photon deposits reduce to a local-cell
    histogram — a fused one-hot reduction (~1.5 ms at 2M photons) — plus a
    D*L*STAMP^2-cell scatter of the aggregate. The XLA flat scatter this
    replaces costs ~20 ms at 2M updates (HBM random RMW bound).

    Energy accounting matches emit(): every photon of light l carries
    energy_l * (W*H) / (2pi * rays_l); the histogram multiplies counts by
    that constant. Requires every active light to pass analytic_light_mask
    geometry (radius < STAMP/2 - 1) so the stamp never clips.

    n_tracers > 1 splits the n photons into T independent tracer batches
    inside the SAME histogram pass: the slot axis widens to T*cap
    (slot j belongs to tracer j // cap, light l_of_slot[j % cap] — iid
    draws, so the T blocks are independent estimators exactly like T
    separate emissions), counts gain a tracer class offset, and each
    tracer's aggregate lands at its own bin block tr*D of the (T*D, S, S)
    sources. Per-tracer energy normalizes by the PER-TRACER ray count
    cap*D, matching what T separate half-batch calls would do.
    """
    d_bins, s = fields.n_bins, fields.size
    capacity = lights.capacity
    stamp = ANALYTIC_STAMP
    cap = -(-n_photons // (d_bins * n_tracers))
    n_emitted = cap * d_bins * n_tracers

    l_of_slot, slots = assign_photons_to_lights(lights, cap)
    l_slot_t = jnp.tile(l_of_slot, n_tracers)                  # (T*cap,)
    aff = take_per_light(lights.affine, l_slot_t)              # (T*cap, 2, 3)
    rel_slot = aff[:, :, 2] - fields.center                    # (T*cap, 2)

    # Disk offsets in the target frame (light affine scales/rotates).
    u = jax.random.uniform(key, (d_bins, cap * n_tracers, 2))
    disk = unit_from_angle(u[..., 0] * TWO_PI) * jnp.sqrt(u[..., 1])[..., None]
    off = affine_linear(aff[None], disk)                       # (D, cap, 2)

    # Per-(bin, light) stamp anchors from the exact light centers.
    centers = lights.affine[:, :, 2]                           # (L, 2)
    relc = centers - fields.center
    cb, sb = fields.cos[:, None], fields.sin[:, None]          # (D, 1)
    cxl = cb * relc[None, :, 0] + sb * relc[None, :, 1] + s / 2.0   # (D, L)
    cyl = -sb * relc[None, :, 0] + cb * relc[None, :, 1] + s / 2.0
    axl = jnp.clip(jnp.floor(cxl).astype(jnp.int32) - stamp // 2, 0, s - stamp)
    ayl = jnp.clip(jnp.floor(cyl).astype(jnp.int32) - stamp // 2, 0, s - stamp)

    # Photon cells in each bin frame (vectorized over D x cap; no scan).
    cbp, sbp = fields.cos[:, None], fields.sin[:, None]        # (D, 1)
    xr = (cbp * rel_slot[None, :, 0] + sbp * rel_slot[None, :, 1] + s / 2.0
          + cbp * off[..., 0] + sbp * off[..., 1])
    yr = (-sbp * rel_slot[None, :, 0] + cbp * rel_slot[None, :, 1] + s / 2.0
          - sbp * off[..., 0] + cbp * off[..., 1])
    ix = jnp.floor(xr).astype(jnp.int32)
    iy = jnp.floor(yr).astype(jnp.int32)
    ax_slot = take_per_light(axl.T, l_slot_t).T                # (D, T*cap)
    ay_slot = take_per_light(ayl.T, l_slot_t).T
    lx = jnp.clip(ix - ax_slot, 0, stamp - 1)
    ly = jnp.clip(iy - ay_slot, 0, stamp - 1)
    col = l_slot_t[None] * (stamp * stamp) + ly * stamp + lx   # (D, T*cap)
    if n_tracers > 1:
        tr = (jnp.arange(cap * n_tracers, dtype=jnp.int32) // cap)
        col = col + tr[None, :] * (capacity * stamp * stamp)

    # Fused one-hot count reduction (XLA keeps the one-hot virtual).
    counts = jnp.sum(
        jax.nn.one_hot(col, n_tracers * capacity * stamp * stamp,
                       dtype=jnp.float32),
        axis=1).reshape(d_bins, n_tracers, capacity, stamp * stamp)

    # Per-light photon energy constant (same for every slot of a light);
    # rays_l is the PER-TRACER ray count — each tracer block is its own
    # estimator normalized by its own emission.
    bounces_l = jnp.where(override_bounces >= 0, override_bounces, lights.bounces)
    rays_l = jnp.maximum(slots * d_bins, 1).astype(jnp.float32)
    e_l = (lights.energy * (pixel_count / TWO_PI) / rays_l[:, None]
           * lights.active.astype(jnp.float32)[:, None]
           * (bounces_l > 0).astype(jnp.float32)[:, None])     # (L, 3)
    vals = (counts[..., None] * e_l[None, None, :, None, :]    # (D, T, L, c, 3)
            ).transpose(1, 0, 2, 3, 4)                         # (T, D, L, c, 3)

    # Aggregate scatter: T*D*L*stamp^2 cells.
    oy = jnp.arange(stamp, dtype=jnp.int32)
    ox = jnp.arange(stamp, dtype=jnp.int32)
    gy = ayl[:, :, None, None] + oy[None, None, :, None]       # (D, L, st, st)
    gx = axl[:, :, None, None] + ox[None, None, None, :]
    flat = ((jnp.arange(d_bins, dtype=jnp.int32)[:, None, None, None] * s + gy)
            * s + gx)
    offs = jnp.arange(n_tracers, dtype=jnp.int32) * (d_bins * s * s)
    flat = flat[None] + offs.reshape(-1, 1, 1, 1, 1)           # (T, D, L, st, st)
    return flat.reshape(-1), vals.reshape(-1, 3), n_emitted


def _mc_scatter_deposits(lights, field_textures,
                         fields: RotatedFields, gbuffer: GBuffer,
                         n_photons: int, key, override_bounces,
                         light_kinds, exclude_analytic: bool,
                         exclude_collimated: bool = False,
                         n_tracers: int = 1):
    """Generic Monte-Carlo direct deposit stream: emit n photons across all
    lights; their energy lands at their rotated emission cells (the TPU
    expression of WritePhoton's InterlockedAdd,
    ForwardMonteCarlo.compute:68-86). Returns (flat_idx, values).

    n_tracers > 1: one emission of n photons partitioned into T
    independent per-tracer blocks (photon j belongs to tracer j // (n/T)),
    each normalized by its own n/T ray count and depositing into its own
    bin block of the (T*D, S, S) sources."""
    height, width = gbuffer.transmissibility.shape
    d_bins, s = fields.n_bins, fields.size
    bin_width = 2 * jnp.pi / d_bins

    n_per = n_photons // n_tracers
    l_idx, rays_per_light = assign_photons_to_lights(lights, n_per)
    if n_tracers > 1:
        l_idx = jnp.tile(l_idx, n_tracers)
    # rays_per_light stays PER-TRACER: emit() normalizes each photon's
    # energy by its light's entry here, which is the per-tracer count.
    pos, direction, energy, bounces = emit(
        lights, field_textures, l_idx, rays_per_light, key,
        (height, width), jnp.float32(1.0), override_bounces,
        active_kinds=light_kinds)

    inject = bounces > 0
    if exclude_analytic:
        inject &= ~take_per_light(analytic_light_mask(lights, override_bounces),
                                  l_idx)
    if exclude_collimated:
        inject &= ~take_per_light(collimated_light_mask(lights, override_bounces),
                                  l_idx)

    theta = jnp.arctan2(direction[:, 1], direction[:, 0])
    b = jnp.round(theta / bin_width - fields.phase).astype(jnp.int32) % d_bins
    if n_tracers > 1:
        b = b + (jnp.arange(n_per * n_tracers, dtype=jnp.int32)
                 // n_per) * d_bins
    ang = (b.astype(jnp.float32) % d_bins + fields.phase) * bin_width
    xr, yr = _rotated_coords(fields, pos, jnp.cos(ang), jnp.sin(ang))
    ix = jnp.clip(jnp.floor(xr).astype(jnp.int32), 0, s - 1)
    iy = jnp.clip(jnp.floor(yr).astype(jnp.int32), 0, s - 1)
    flat = (b * s + iy) * s + ix
    return flat, jnp.where(inject[:, None], energy, 0.0)


def _bounce_chain_deposits(fields: RotatedFields, gbuffer: GBuffer,
                           lights, field_textures, brdf_lut, key, k_photons: int,
                           override_bounces, max_bounces: int, enable_brdf: bool,
                           light_kinds, stratified: bool, n_tracers: int = 1):
    """Trace k bounce chains; return their wave >= 1 deposit stream
    (flat_idx, values) — all waves concatenated so the frame pays one
    scatter, not one per wave.

    The chains are the Russian-roulette continuation of the frame's photon
    batch: a fresh emission of k photons is identical in distribution to
    keeping a uniform k-subset of the n direct photons (photons are iid),
    and emit() normalizes per-photon energy by k, which IS the n/k
    roulette rescale. Direct (wave-0) deposits are NOT produced here —
    the direct phase covered all n photons.

    n_tracers > 1: the k chains split into T independent per-tracer
    blocks flown in the SAME batch. Flight, material lookup, and scatter
    are tracer-blind (same transport fields — one shared scene); tracer
    identity only offsets each chain's deposit bin by tr*D, so the whole
    dual-tracer bounce phase costs what a single tracer's k chains do.
    Per-tracer energy normalizes by the per-tracer emission count.
    """
    height, width = gbuffer.transmissibility.shape
    d_bins, s = fields.n_bins, fields.size
    bin_width = 2 * jnp.pi / d_bins
    k_emit, key = jax.random.split(key)

    # One packed material field -> one lookup per photon per wave instead
    # of two (per-photon random access is the per-wave cost floor).
    material = jnp.concatenate([gbuffer.normal, gbuffer.albedo[..., :3]], -1)

    wave0 = None
    if stratified:
        cap = -(-k_photons // (d_bins * n_tracers))
        l_of_slot, slots = assign_photons_to_lights(lights, cap)
        if n_tracers > 1:
            l_of_slot = jnp.tile(l_of_slot, n_tracers)
        # slots stays PER-TRACER: emit_point_stratified normalizes light
        # l's photons by slots[l]*D — each tracer block's own ray count.
        pos, direction, energy, bounces = emit_point_stratified(
            lights, l_of_slot, slots, d_bins, fields.phase, k_emit,
            (height, width), jnp.float32(1.0), override_bounces)
        key, k_tp = jax.random.split(key)
        live0 = 0 < bounces
        u_tp = jax.random.uniform(k_tp, bounces.shape)
        p_hit, t_esc, found = _flight_stratified(fields, pos, live0, u_tp)
        flat = lambda a: a.reshape((d_bins * cap * n_tracers,) + a.shape[2:])
        pos, direction, energy, bounces = map(
            flat, (pos, direction, energy, bounces))
        wave0 = (flat(p_hit), flat(t_esc), flat(found))
        tracer_of = jnp.tile(
            jnp.arange(cap * n_tracers, dtype=jnp.int32) // cap, d_bins)
    else:
        k_per = k_photons // n_tracers
        l_idx, rays_per_light = assign_photons_to_lights(lights, k_per)
        if n_tracers > 1:
            l_idx = jnp.tile(l_idx, n_tracers)
        pos, direction, energy, bounces = emit(
            lights, field_textures, l_idx, rays_per_light, k_emit,
            (height, width), jnp.float32(1.0), override_bounces,
            active_kinds=light_kinds)
        tracer_of = jnp.arange(k_per * n_tracers, dtype=jnp.int32) // k_per

    m = pos.shape[0]
    dead = jnp.zeros(m, bool)
    on_tpu = jax.default_backend() == "tpu"
    all_flat, all_vals = [], []

    for wave in range(max_bounces - 1):
        key, k_tp, k_scatter = jax.random.split(key, 3)
        live = (~dead) & (wave < bounces)

        if wave == 0 and wave0 is not None:
            p_hit, t_esc, found = wave0
        else:
            u_tp = jax.random.uniform(k_tp, (m,))
            p_hit, t_esc, found = _flight_rows(fields, pos, direction, live, u_tp)
        dead = dead | (live & ~found)

        # --- material lookup + scatter at the interaction point ---
        if on_tpu:
            # Nearest lookup as a factorized tent matmul at texel centers
            # (ops/resample.py): ~4.6 ms vs ~5.8 ms XLA gather at 524K.
            centers = jnp.stack(
                [jnp.clip(jnp.floor(p_hit[:, 0]), 0, width - 1) + 0.5,
                 jnp.clip(jnp.floor(p_hit[:, 1]), 0, height - 1) + 0.5], -1)
            mat = gather_bilinear_mxu(material, centers)
        else:
            gx = jnp.clip(jnp.floor(p_hit[:, 0]).astype(jnp.int32), 0, width - 1)
            gy = jnp.clip(jnp.floor(p_hit[:, 1]).astype(jnp.int32), 0, height - 1)
            mat = material[gy, gx]
        normal4 = mat[:, :4]
        albedo = mat[:, 4:7]

        rand3 = jax.random.uniform(k_scatter, (m, 3))
        new_dir, mat_scale, pushback = scatter_materially(
            brdf_lut, normal4, direction, rand3, fast=True,
            enable_brdf=enable_brdf)

        bounced = found
        energy = jnp.where(bounced[:, None],
                           energy * albedo * ((1.0 - t_esc) * mat_scale)[:, None],
                           energy)
        pos = jnp.where(bounced[:, None], p_hit + pushback + new_dir, pos)
        direction = jnp.where(bounced[:, None], new_dir, direction)

        # --- record the bounce deposit at the new position ---
        live_next = (~dead) & (wave + 1 < bounces)
        theta = jnp.arctan2(direction[:, 1], direction[:, 0])
        b = jnp.round(theta / bin_width - fields.phase).astype(jnp.int32) % d_bins
        ang = (b.astype(jnp.float32) + fields.phase) * bin_width
        xr, yr = _rotated_coords(fields, pos, jnp.cos(ang), jnp.sin(ang))
        ix = jnp.clip(jnp.floor(xr).astype(jnp.int32), 0, s - 1)
        iy = jnp.clip(jnp.floor(yr).astype(jnp.int32), 0, s - 1)
        if n_tracers > 1:
            b = b + tracer_of * d_bins
        all_flat.append((b * s + iy) * s + ix)
        all_vals.append(jnp.where(live_next[:, None], energy, 0.0))
    return jnp.concatenate(all_flat), jnp.concatenate(all_vals)


@functools.partial(jax.jit, static_argnames=(
    "n_photons", "max_bounces", "analytic_direct", "bounce_photons",
    "mc_direct", "enable_brdf", "light_kinds", "hist_direct",
    "exact_collimated", "n_tracers"),
    donate_argnames=("src_accum",))
def rbt_trace_frame(fields: RotatedFields, src_accum: jax.Array, gbuffer: GBuffer,
                    lights, field_textures, brdf_lut, key,
                    n_photons: int, override_bounces, max_bounces: int = 4,
                    analytic_direct: bool = True, bounce_photons: int = 0,
                    mc_direct: bool = True, enable_brdf: bool = True,
                    light_kinds: tuple | None = None,
                    hist_direct: bool = False,
                    exact_collimated: bool = False,
                    n_tracers: int = 1):
    """Trace one frame's photons; accumulate sources into src_accum.

    Returns (src_accum, photons_emitted); src_accum is the per-channel
    source buffer tuple (3 x (n_tracers*D, S, S)). The lightmap itself is
    produced by resolve_raw (deferred scan + rotate-back).

    n_tracers > 1 — the NATIVE dual-tracer axis (the reference runs two
    independent tracers per frame purely for variance estimation,
    Simulation.cs:78): n_photons and bounce_photons are TOTALS split into
    T independent per-tracer blocks traced in ONE combined batch. Tracer
    identity only offsets a photon's deposit bin by tr*D into the
    tracer-major source buffer; emission, flight, and material scatter are
    tracer-blind because the pair shares one scene and one set of rotated
    fields. This pays the frame's fixed costs (histogram reduction, scan
    steps, per-wave flight math, ONE full-target scatter) once instead of
    once per tracer — two sequential half-batch traces measured ~2x this
    (runs/bench1080_r4_pair.log vs r5). Each tracer's block is normalized
    by its OWN ray count, so resolve_raw(tracer=t) is distributed
    identically to a separate half-batch tracer.

    The frame is two decoupled estimator phases (equal in distribution to
    the reference's single photon loop, ForwardMonteCarlo.compute:107-216):

      1. DIRECT: all n photons' wave-0 deposits. analytic_direct injects
         maskable point lights' exact expectation (zero-variance);
         mc_direct samples per-photon deposits — via the stamp-histogram
         fast path (hist_direct, all-point scenes) or a generic scatter.
      2. BOUNCE: k = bounce_photons chains (Russian roulette, energy
         renormalized by emission) fly, scatter materially, and inject
         wave >= 1 deposits. Fresh emission of k chains is identical in
         distribution to subsampling k of the n direct photons, because
         photons are iid within each light.

    Splitting the phases is what lets the roulette cull happen BEFORE the
    expensive per-photon flight: wave-0 free flights are only computed for
    the k continuing chains (the direct deposits never needed them — RBT
    deposits are injection + the deferred attenuation scan).

    hist_direct (static) requires every active light to be a point light
    passing analytic_light_mask geometry; the tracer host derives it from
    scene content (tracers.py), like the reference's per-light kernel
    selection (ForwardMonteCarlo.cs:203-265).
    """
    flat, vals, n_emitted = rbt_frame_deposits(
        fields, gbuffer, lights, field_textures, brdf_lut, key, n_photons,
        override_bounces, max_bounces=max_bounces,
        analytic_direct=analytic_direct, bounce_photons=bounce_photons,
        mc_direct=mc_direct, enable_brdf=enable_brdf,
        light_kinds=light_kinds, hist_direct=hist_direct,
        exact_collimated=exact_collimated, n_tracers=n_tracers)
    if flat is not None:
        src_accum = _inject_flat(src_accum, flat, vals)
    return src_accum, n_emitted


@functools.partial(jax.jit, static_argnames=(
    "n_photons", "max_bounces", "analytic_direct", "bounce_photons",
    "mc_direct", "enable_brdf", "light_kinds", "hist_direct",
    "exact_collimated", "n_tracers"))
def rbt_frame_deposits(fields: RotatedFields, gbuffer: GBuffer,
                       lights, field_textures, brdf_lut, key,
                       n_photons: int, override_bounces, max_bounces: int = 4,
                       analytic_direct: bool = True, bounce_photons: int = 0,
                       mc_direct: bool = True, enable_brdf: bool = True,
                       light_kinds: tuple | None = None,
                       hist_direct: bool = False,
                       exact_collimated: bool = False,
                       n_tracers: int = 1):
    """One frame's photon work WITHOUT the scatter: returns the deposit
    stream (flat_idx, values, photons_emitted), flat_idx indexing the
    flattened (n_tracers*D*S*S) source planes.

    The scatter into the big source buffer is full-target bound (~3-5 ms
    at the 1080p shape regardless of update count: XLA materializes a copy
    of the operand), so a frame loop that wants to amortize it can stage
    several frames' streams in a small pending buffer and flush them in
    ONE scatter every K frames (runs/bench_1080p.py --pair fast path);
    rbt_trace_frame is the scatter-per-frame composition of this.
    """
    height, width = gbuffer.transmissibility.shape
    k_direct, k_bounce = jax.random.split(key)
    n_emitted = n_photons

    # Every phase returns a deposit stream; the frame pays ONE scatter.
    # A flat scatter into the 3 x (D, S, S) planes costs ~3.5-5 ms at S=640
    # nearly INDEPENDENT of update count (full-target bound), so per-phase
    # injects were ~60% of the realtime trace (round-3 prof: 12.7 ms trace
    # -> two injects ~7 ms of it at the 1080p shape).
    all_flat, all_vals = [], []

    if analytic_direct:
        light_mask = analytic_light_mask(lights, override_bounces)
        f, v = _analytic_point_deposits(lights, light_mask, fields,
                                        float(width * height),
                                        n_tracers=n_tracers)
        all_flat.append(f)
        all_vals.append(v)
    if mc_direct:
        if hist_direct:
            f, v, n_emitted = _mc_point_hist_deposits(
                lights, fields, n_photons, k_direct,
                override_bounces, float(width * height),
                n_tracers=n_tracers)
        else:
            f, v = _mc_scatter_deposits(
                lights, field_textures, fields, gbuffer,
                n_photons, k_direct, override_bounces, light_kinds,
                exclude_analytic=analytic_direct,
                exclude_collimated=exact_collimated,
                n_tracers=n_tracers)
        all_flat.append(f)
        all_vals.append(v)

    if max_bounces >= 2:
        k = (bounce_photons if 0 < bounce_photons < n_photons else n_photons)
        stratified = hist_direct or light_kinds == (LIGHT_POINT,)
        f, v = _bounce_chain_deposits(
            fields, gbuffer, lights, field_textures, brdf_lut,
            k_bounce, k, override_bounces, max_bounces, enable_brdf,
            light_kinds, stratified, n_tracers=n_tracers)
        all_flat.append(f)
        all_vals.append(v)

    if not all_flat:
        return None, None, jnp.int32(n_emitted)
    return (jnp.concatenate(all_flat), jnp.concatenate(all_vals),
            jnp.int32(n_emitted))


@jax.jit
def attenuation_scan(fields: RotatedFields, src_accum: tuple) -> jax.Array:
    """Per-row linear recurrence O[x] = t[x]*O[x-1] + src[x] over all bins.

    Numerically stable by construction (t <= 1, no exponentials of
    cumulative depth), unlike the naive exp(C)*cumsum(exp(-C)*src) form.
    Returns deposits stacked channel-last (D, S, S, 3).

    On TPU the recurrence runs as a single-pass Pallas kernel
    (ops/attnscan.py): XLA's associative_scan costs ~2*log2(S) HBM passes
    over the (D, S, S) state (~25 ms at S=640/D=128), the kernel one.
    """
    if jax.default_backend() == "tpu" and fields.size % 128 == 0:
        from ..ops.attnscan import attenuation_scan_rows

        dep = attenuation_scan_rows(fields.trans, *src_accum)
        return jnp.stack(dep, axis=-1)
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
        oy = (s - height) // 2
        ox = (s - width) // 2
        # Fused final shear: sum over bins in-kernel and emit only the
        # central row range — saves the full (D, S, S, 3) rotated-output HBM
        # round-trip plus the separate reduction. 64-aligned so the kernel
        # can use full 128-row super-blocks (ops/rotate._super_rows).
        lo = (oy // 64) * 64
        hi = min(-(-(oy + height) // 64) * 64, s)
        # The matmul path samples with R(-theta_d); rotate_bins' convention
        # is R(+a), so a = -theta_d (validated against the matmul path).
        if traced_phase:
            angles = -(jnp.arange(d, dtype=jnp.float32) + fields.phase) * (2.0 * np.pi / d)
            rotated = rotate_bins(deposited, angles, reduce_rows=(lo, hi))
        else:
            angles = [-i * 2.0 * np.pi / d for i in range(d)]
            rotated = rotate_bins_uniform(deposited, tuple(angles),
                                          reduce_rows=(lo, hi))
        return rotated[oy - lo:oy - lo + height, ox:ox + width]
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


@functools.partial(jax.jit, static_argnames=("height", "width", "traced_phase",
                                              "group", "n_groups", "tracer"))
def resolve_raw(fields: RotatedFields, src_accum: jax.Array,
                height: int, width: int, traced_phase: bool = False,
                group: int = 0, n_groups: int = 1,
                tracer: int = 0) -> jax.Array:
    """Scan + rotate-back in one jitted call -> raw (H, W, 3) deposit map
    (the analog of the oracle's accumulated `raw`; feed to oracle.to_hdr).

    TPU fast path: single-pass Pallas scan (ops/attnscan.py) feeding the
    planar rotate-and-sum (ops/rotate.rotate_planar_sum) — channel-planar
    end to end, static quadrant pre-rotation even for the traced jitter
    phase (delta folds into the shear residual bounds).

    group/n_groups (static) resolve ONLY the bins d == group (mod n_groups)
    at 1/n_groups the cost: sum over all groups equals the full resolve
    (the per-bin math is identical; only the reduction partition differs).
    The realtime display path resolves one angular group per frame and
    composes the n_groups cached partials — exact for static accumulation,
    a bounded angular lag when animating (tracers.RBTForwardIntegrator).

    tracer (static) selects one tracer block of a tracer-major
    (T*D, S, S) source buffer produced by rbt_trace_frame(n_tracers=T):
    the scan reads src blocks at offset tracer*D while the shared
    (D, S, S) transport fields index by bin — pure BlockSpec arithmetic,
    no sliced copy of the sources."""
    s, d = fields.size, fields.n_bins
    bins = range(group, d, n_groups)
    if jax.default_backend() == "tpu" and s % 128 == 0 and len(bins) >= 8:
        from ..ops.attnscan import attenuation_scan_rows
        from ..ops.rotate import rotate_planar_sum

        # Group selection happens inside the scan's BlockSpec index_map
        # (strided HBM block reads, no sliced-copy of the (D, S, S) inputs).
        dep = attenuation_scan_rows(fields.trans, *src_accum,
                                    group=group, n_groups=n_groups,
                                    src_offset=tracer * d)
        oy = (s - height) // 2
        ox = (s - width) // 2
        base = tuple(-i * 2.0 * np.pi / d for i in bins)
        max_delta = 2.0 * np.pi / d
        delta = (-fields.phase * max_delta) if traced_phase else 0.0
        # Quadrant-run shear pipeline. The whole-image fused 3-shear kernel
        # (rotate_planar_sum_fused) measured SLOWER once DCE artifacts were
        # removed: 53.3 vs 32.9 ms full, 14.0 vs 8.2 ms at 1/4 groups at
        # S=640/D=128 (runs/prof_resolve6.py) — its per-channel pallas_call
        # repeats the two in-VMEM transposes 3x, while this path shears all
        # channels in one batched call.
        lo = (oy // 64) * 64
        hi = min(-(-(oy + height) // 64) * 64, s)
        out = rotate_planar_sum(dep, base, delta, max_delta, lo, hi)
        out = out[:, oy - lo:oy - lo + height, ox:ox + width]
        return jnp.moveaxis(out, 0, -1)
    if tracer or src_accum[0].shape[0] != d:
        # Generic paths: materialize the tracer block (tests/CPU only —
        # the TPU fast path above never slices).
        src_accum = tuple(ch[tracer * d:(tracer + 1) * d] for ch in src_accum)
    if n_groups == 1:
        deposited = attenuation_scan(fields, src_accum)
        return rotate_back(fields, deposited, height, width,
                           traced_phase=traced_phase)
    # Grouped generic fallback (CPU/tests/small groups): inline scan over
    # the sliced bins + per-bin inverse-rotation gather. fields.cos/sin
    # already fold the jitter phase in, so traced_phase needs no branch.
    trans = fields.trans[group::n_groups]
    src = tuple(ch[group::n_groups] for ch in src_accum)
    sqrt_t = jnp.sqrt(trans)

    def combine(a, b):
        return (a[0] * b[0], a[1] * b[0] + b[1])

    deps = []
    for c in range(3):
        _, dep = jax.lax.associative_scan(combine, (trans, src[c] * sqrt_t),
                                          axis=2)
        deps.append(dep)
    deposited = jnp.stack(deps, axis=-1)
    ys, xs = jnp.mgrid[0:height, 0:width]
    p = jnp.stack([xs + 0.5, ys + 0.5], -1).reshape(-1, 2).astype(jnp.float32)
    rel = p - fields.center

    def one(args):
        dep_d, cb, sb = args
        xr = cb * rel[:, 0] + sb * rel[:, 1] + s / 2.0
        yr = -sb * rel[:, 0] + cb * rel[:, 1] + s / 2.0
        return gather_bilinear_mxu(dep_d, jnp.stack([xr, yr], -1))

    per_bin = jax.lax.map(one, (deposited, fields.cos[group::n_groups],
                                fields.sin[group::n_groups]))
    return per_bin.sum(0).reshape(height, width, 3)
