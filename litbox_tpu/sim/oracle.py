"""Oracle forward tracer: the reference estimator as a masked lock-step march.

This is a faithful JAX expression of the reference's per-thread photon
program (`Integrate`, SimulationCommon.cginc:387-456, with the
ForwardMonteCarlo method, ForwardMonteCarlo.compute:107-216):

  Each bounce is two traversals over the transmissibility field:
    SEARCH  — march texel steps to the frame edge, multiplying cumulative
              transmissibility and depositing stratified in-scatter samples
              (weight E * interval^2 * T_cum) every `interval` texels.
    RESOLVE — sample a transmit potential tp ~ U[T_total, 1]
              (ForwardMonteCarlo.compute:209-214: distance sampling by
              inverting the transmittance function, with quantum scale
              1 - T_total = P(interact within the frame)), re-march to the
              first texel where T_cum * T_next < tp, solve the fractional
              crossing, and scatter materially there.

  GPU thread divergence becomes masked fixed-trip `lax.scan` steps; the
  `InterlockedAdd` lightmap writes become one batched scatter-add of the
  recorded deposit stream per wave (no atomics exist or are needed on TPU —
  XLA scatter-add is deterministic).

This tracer is the semantic ground truth the fast engine (sim/rbt.py) is
validated against; it runs anywhere but leans on gathers, so it is not the
production TPU path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.sampling import sample_bilinear_uv, sample_nearest_uv
from ..core.types import GBuffer
from ..ops.scatter import scatter_add_bilinear_mxu, scatter_add_nearest_mxu
from .emission import assign_photons_to_lights, emit
from .materials import scatter_materially


class PhotonState(NamedTuple):
    origin: jax.Array     # (N, 2) texel coords
    direction: jax.Array  # (N, 2) unit
    energy: jax.Array     # (N, 3)
    bounces: jax.Array    # (N,) per-photon budget
    dead: jax.Array       # (N,) bool


def _escape_distance(origin_uv: jax.Array, dir_uv: jax.Array, pixel: jax.Array) -> jax.Array:
    """Slab test against the frame box padded by one texel
    (SimulationCommon.cginc:400-404); result in texel units."""
    lo = (-pixel - origin_uv) / dir_uv
    hi = (1.0 + pixel - origin_uv) / dir_uv
    return jnp.minimum(jnp.maximum(lo, hi)[..., 0], jnp.maximum(lo, hi)[..., 1])


def _nonzero_dir(d: jax.Array) -> jax.Array:
    return jnp.where(d == 0.0, 1e-8, d)


def _search_march(trans_field, state, wave_alive, uesc, origin_uv, dir_uv,
                  interval: float, key, max_steps: int):
    """SEARCH phase: total transmittance + compacted stratified deposits.

    Deposits are accumulated into dense per-photon ordinal buffers
    (N, MAXD) via one-hot masks — pure VPU work, no scatter. The deposit
    ordinal IS the stratified sample index, so the buffers are exact and
    tightly bounded by MAXD = ceil(steps/interval) + 2.
    """
    n = state.origin.shape[0]
    maxd = int((max_steps + 1) / interval) + 2
    ordinals = jnp.arange(maxd, dtype=jnp.float32)

    k0, key = jax.random.split(key)
    u_target0 = jax.random.uniform(k0, (n,)) * interval

    def step(carry, k):
        trans, u_target, sample_idx, dep_u, dep_w, key = carry
        u_next = (k + 1).astype(jnp.float32)
        uv = origin_uv + dir_uv * k.astype(jnp.float32)
        t = sample_bilinear_uv(trans_field, uv)
        active = (u_next <= uesc) & wave_alive
        trans = jnp.where(active, trans * t, trans)

        # Up to two stratified deposits fit in a unit step when interval >= 1
        # (consecutive stratified gaps sum to >= interval).
        key, ka, kb = jax.random.split(key, 3)
        for kd in (ka, kb):
            fire = active & (u_next > u_target)
            onehot = (ordinals[None, :] == sample_idx[:, None]) & fire[:, None]
            dep_u = dep_u + jnp.where(onehot, u_target[:, None], 0.0)
            dep_w = dep_w + jnp.where(onehot, (interval * interval * trans)[:, None], 0.0)
            xi = jax.random.uniform(kd, (n,))
            sample_idx = jnp.where(fire, sample_idx + 1.0, sample_idx)
            u_target = jnp.where(fire, (sample_idx + xi) * interval, u_target)

        return (trans, u_target, sample_idx, dep_u, dep_w, key), None

    init = (jnp.ones((n,)), u_target0, jnp.zeros((n,)),
            jnp.zeros((n, maxd)), jnp.zeros((n, maxd)), key)
    (trans, _, sample_idx, dep_u, dep_w, _), _ = jax.lax.scan(
        step, init, jnp.arange(max_steps))
    return trans, dep_u, dep_w, sample_idx


def _resolve_march(trans_field, wave_alive, uesc, origin_uv, dir_uv, tp, max_steps):
    """RESOLVE phase: locate the sampled interaction point."""
    n = origin_uv.shape[0]

    def step(carry, k):
        trans, found, escaped, u_hit, test_uv = carry
        u_next = (k + 1).astype(jnp.float32)
        uv = origin_uv + dir_uv * k.astype(jnp.float32)
        t = sample_bilinear_uv(trans_field, uv)
        live = wave_alive & ~found & ~escaped
        esc_now = live & (u_next > uesc)
        cross = live & ~esc_now & (t * trans < tp)
        # Fractional crossing within the tested texel
        # (ForwardMonteCarlo.compute:184-192).
        frac = jnp.log2(jnp.maximum(tp / jnp.maximum(trans, 1e-30), 1e-30)) / (
            jnp.log2(jnp.maximum(t, 1e-30)) - 1e-5)
        u_hit = jnp.where(cross, u_next + frac, u_hit)
        test_uv = jnp.where(cross[:, None], uv, test_uv)
        found |= cross
        escaped |= esc_now
        trans = jnp.where(live & ~cross & ~esc_now, trans * t, trans)
        return (trans, found, escaped, u_hit, test_uv), None

    init = (jnp.ones((n,)), jnp.zeros(n, bool), jnp.zeros(n, bool),
            jnp.zeros((n,)), origin_uv)
    (_, found, escaped, u_hit, test_uv), _ = jax.lax.scan(step, init, jnp.arange(max_steps))
    return found, escaped, u_hit, test_uv


@functools.partial(jax.jit, static_argnames=(
    "n_photons", "interval", "max_bounces", "max_steps", "bilinear"))
def trace_frame(gbuffer: GBuffer, lights, field_textures, brdf_lut, key,
                n_photons: int, interval: float, override_bounces,
                max_bounces: int = 4, max_steps: int = 0, bilinear: bool = True):
    """Trace one frame's photon batch; returns (raw (H,W,3), write_count).

    `raw` is the frame's energy deposit map before HDR conversion — the float
    analog of the reference's fixed-point g_output_raw, already incorporating
    the (W*H)/(rays*interval) emission scaling so that
    `hdr = accumulate(raw)/iterations * albedo * outscatter` matches
    ConvertToHDR (ForwardMonteCarlo.compute:358-382).
    """
    height, width = gbuffer.transmissibility.shape
    if max_steps <= 0:
        max_steps = int((height**2 + width**2) ** 0.5) + 4
    interval = float(max(interval, 1e-2))
    size = jnp.array([width, height], dtype=jnp.float32)
    pixel = 1.0 / size

    k_emit, key = jax.random.split(key)
    l_idx, rays_per_light = assign_photons_to_lights(lights, n_photons)
    origin, direction, energy, bounces = emit(
        lights, field_textures, l_idx, rays_per_light, k_emit,
        (height, width), jnp.float32(interval), override_bounces)

    state = PhotonState(origin, direction, energy, bounces,
                        dead=jnp.zeros(n_photons, bool))
    accum = jnp.zeros((height, width, 3))
    write_count = jnp.zeros((), jnp.int64 if jax.config.jax_enable_x64 else jnp.int32)

    for wave in range(max_bounces):
        key, k_search, k_tp, k_scatter = jax.random.split(key, 4)
        wave_alive = (~state.dead) & (wave < state.bounces)

        d = _nonzero_dir(state.direction)
        origin_uv = state.origin / size
        dir_uv = d / size
        uesc = _escape_distance(origin_uv, dir_uv, pixel)

        t_total, dep_u, dep_w, n_deposits = _search_march(
            gbuffer.transmissibility, state, wave_alive, uesc, origin_uv, dir_uv,
            interval, k_search, max_steps)

        # Splat this wave's compacted deposit stream via MXU matmuls
        # (ops/scatter.py) — the TPU-native replacement for InterlockedAdd.
        # Out-of-frame taps vanish under the tent weights, matching the GPU's
        # silently-dropped out-of-bounds writes.
        pos = (state.origin[:, None, :]
               + state.direction[:, None, :] * dep_u[..., None]).reshape(-1, 2)
        values = (state.energy[:, None, :] * dep_w[..., None]).reshape(-1, 3)
        scatter = scatter_add_bilinear_mxu if bilinear else scatter_add_nearest_mxu
        accum = scatter(accum, pos, values)
        write_count = write_count + jnp.sum(n_deposits).astype(write_count.dtype)

        # Transmit potential + quantum scale (ForwardMonteCarlo.compute:209-214).
        tp = t_total + jax.random.uniform(k_tp, (n_photons,)) * (1.0 - t_total)
        quantum_scale = 1.0 - t_total

        found, escaped, u_hit, test_uv = _resolve_march(
            gbuffer.transmissibility, wave_alive, uesc, origin_uv, dir_uv, tp, max_steps)

        pos_hit = state.origin + state.direction * u_hit[:, None]
        normal4 = sample_bilinear_uv(gbuffer.normal, test_uv)
        albedo = sample_nearest_uv(gbuffer.albedo, test_uv)[..., :3]

        rand3 = jax.random.uniform(k_scatter, (n_photons, 3))
        new_dir, mat_scale, pushback = scatter_materially(
            brdf_lut, normal4, state.direction, rand3)

        bounced = wave_alive & found
        energy = jnp.where(
            bounced[:, None],
            state.energy * albedo * (quantum_scale * mat_scale)[:, None],
            state.energy)
        origin = jnp.where(bounced[:, None], pos_hit + pushback + new_dir, state.origin)
        direction = jnp.where(bounced[:, None], new_dir, state.direction)
        dead = state.dead | (wave_alive & ~found)

        state = PhotonState(origin, direction, energy, state.bounces, dead)

    return accum, write_count


def to_hdr(accum: jax.Array, iterations: jax.Array, gbuffer: GBuffer,
           finalize_outscatter: bool = True) -> jax.Array:
    """ConvertToHDR (ForwardMonteCarlo.compute:358-382) in float arithmetic."""
    out = accum / jnp.maximum(iterations, 1.0)
    out = out * gbuffer.albedo[..., :3]
    if finalize_outscatter:
        out = out * (1.0 - gbuffer.transmissibility)[..., None]
    return out
