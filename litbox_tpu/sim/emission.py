"""Photon emission for all light types, as one fused batched kernel.

The reference dispatches one compute kernel per light
(`ForwardMonteCarlo.compute:218-355`, host loop `ForwardMonteCarlo.cs:182-186`)
and distributes rays across lights proportionally to luminance, rounded to
64-thread groups (`ForwardMonteCarlo.cs:174-206`). Here the whole frame's
photons are ONE batch: each photon picks its light by a deterministic
proportional split, all seven emitters are evaluated vectorized, and the
result is mask-selected — so one jitted trace covers any scene.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.sampling import sample_bilinear_uv
from ..core.types import (
    LIGHT_AMBIENT,
    LIGHT_DIRECTIONAL,
    LIGHT_FIELD,
    LIGHT_LASER,
    LIGHT_POINT,
    LIGHT_SPOT,
    affine_apply,
    affine_linear,
    luminance,
)
from .materials import TWO_PI, unit_from_angle
from ..scene.scene import Lights


def take_per_light(table: jax.Array, l_idx: jax.Array) -> jax.Array:
    """table[l_idx] for a per-light table of small capacity L, computed as a
    masked broadcast-sum instead of a gather.

    XLA TPU gathers run at ~100 M rows/s; the six per-photon light-property
    lookups in emit() cost ~30 ms/frame at 2M photons as gathers but are
    VPU-trivial as (N, L) compare+selects for the L <= 8 lights a scene has.
    """
    capacity = table.shape[0]
    onehot = l_idx[..., None] == jnp.arange(capacity, dtype=l_idx.dtype)
    sel = onehot.reshape(onehot.shape + (1,) * (table.ndim - 1))
    return jnp.sum(jnp.where(sel, table, 0), axis=l_idx.ndim)


def assign_photons_to_lights(lights: Lights, n_photons: int,
                             interleave: int = 1) -> tuple[jax.Array, jax.Array]:
    """Deterministic proportional split of the photon batch across lights.

    Returns (light_index (N,), rays_per_light (L,)). Proportions follow
    luminance like ForwardMonteCarlo.Integrate (ForwardMonteCarlo.cs:174-186).

    interleave > 1 permutes the batch ranks arithmetically so that the
    CONTIGUOUS prefix of n/interleave photons is exactly the
    every-interleave-th systematic subsample of the canonical order — the
    Russian-roulette bounce cull then reduces to a free prefix slice instead
    of a strided one (rbt.py cull). Pure rank arithmetic; no gather.
    """
    w = luminance(lights.energy) * lights.active.astype(jnp.float32)
    cum = jnp.cumsum(w)
    total = cum[-1]
    rank = jnp.arange(n_photons, dtype=jnp.int32)
    if interleave > 1:
        keep = n_photons // interleave
        body = keep * interleave
        perm = (rank % keep) * interleave + rank // keep
        rank = jnp.where(rank < body, perm, rank)
    t = (rank.astype(jnp.float32) + 0.5) / n_photons * total
    l_idx = jnp.searchsorted(cum, t, side="right").astype(jnp.int32)
    l_idx = jnp.minimum(l_idx, lights.capacity - 1)
    rays_per_light = jnp.sum(
        l_idx[None, :] == jnp.arange(lights.capacity, dtype=jnp.int32)[:, None], axis=1)
    return l_idx, rays_per_light


def emit(lights: Lights, field_textures: jax.Array, l_idx: jax.Array,
         rays_per_light: jax.Array, key: jax.Array, target_size: tuple[int, int],
         interval: jax.Array, override_bounces: jax.Array,
         active_kinds: tuple | None = None) -> tuple[jax.Array, ...]:
    """Emit one photon per batch lane.

    Returns (origin (N,2), direction (N,2), energy (N,3), bounces (N,)).
    Energy folds in the reference's normalization chain: per-photon energy
    (uint.MaxValue/rays -> here (W*H)/rays) times the 1/interval adjustment
    (ForwardMonteCarlo.cs:210,242-245) and emitter-specific pdf factors.

    active_kinds (static) restricts which emitters are computed: each type's
    math is otherwise evaluated for every lane and mask-selected, and the
    field-light texture sampling in particular costs gathers per photon.
    """
    n = l_idx.shape[0]
    height, width = target_size
    size = jnp.array([width, height], dtype=jnp.float32)

    def want(k):
        return active_kinds is None or k in active_kinds

    kind = take_per_light(lights.kind, l_idx)
    aff = take_per_light(lights.affine, l_idx)
    r = jax.random.uniform(key, (n, 5))

    # --- Point (ForwardMonteCarlo.compute:218-231) ---
    disk = unit_from_angle(r[:, 0] * TWO_PI) * jnp.sqrt(r[:, 1])[:, None]
    point_origin = affine_apply(aff, disk)
    point_dir = unit_from_angle(r[:, 2] * TWO_PI)
    point_scale = jnp.full((n,), 1.0 / TWO_PI)

    # --- Spot (:233-241): box origin, cone within +-45 deg of local -y ---
    spot_origin = affine_apply(aff, jnp.stack([r[:, 0] - 0.5, r[:, 1] - 0.5], -1))
    spot_local = jnp.stack([2 * r[:, 2] - 1, -jnp.ones((n,))], -1)
    spot_dir = affine_linear(aff, spot_local)
    spot_dir = spot_dir / jnp.linalg.norm(spot_dir, axis=-1, keepdims=True)

    # --- Laser (:243-251): line origin, collimated local -y ---
    laser_origin = affine_apply(aff, jnp.stack([r[:, 0] - 0.5, r[:, 1]], -1))
    laser_dir = affine_linear(aff, jnp.stack([jnp.zeros((n,)), -jnp.ones((n,))], -1))
    laser_dir = laser_dir / jnp.linalg.norm(laser_dir, axis=-1, keepdims=True)

    # --- Ambient (:253-262): frame-wide origins, inward-biased directions ---
    n_origin = r[:, 0:2]
    ambient_origin = n_origin * size
    amb_dir = unit_from_angle(r[:, 2] * TWO_PI) - (n_origin * 2 - 1) / 1.44
    ambient_dir = amb_dir / jnp.linalg.norm(amb_dir, axis=-1, keepdims=True)

    # --- Field (:264-280): texture-modulated area light ---
    field_uv = r[:, 0:2]
    field_origin = affine_apply(aff, field_uv * 2 - 1)
    field_dir = point_dir
    if want(LIGHT_FIELD):
        # Per-photon texture selection via a vertical atlas: stack tiles
        # along v and offset each photon's v by its tile index (clamped half
        # a texel inside the tile to prevent cross-tile bleeding). Avoids a
        # per-photon dynamic texture gather materializing (N, FH, FW, 4).
        n_tiles, fh = field_textures.shape[0], field_textures.shape[1]
        atlas = field_textures.reshape((n_tiles * fh,) + field_textures.shape[2:])
        half_v = 0.5 / fh
        tile = take_per_light(lights.tex_index, l_idx).astype(jnp.float32)
        atlas_uv = jnp.stack(
            [field_uv[:, 0],
             (tile + jnp.clip(field_uv[:, 1], half_v, 1.0 - half_v)) / n_tiles], -1)
        tex = sample_bilinear_uv(atlas, atlas_uv)
        field_energy_mod = tex[:, :3] * jnp.maximum(tex[:, 3:4] - 0.08, 0.0)
    else:
        field_energy_mod = jnp.ones((n, 3))

    # --- Directional (:282-294): parallel rays entering the frame ---
    dl = affine_linear(aff, jnp.stack([jnp.zeros((n,)), -jnp.ones((n,))], -1))
    dl = dl / jnp.linalg.norm(dl, axis=-1, keepdims=True)
    dperp = jnp.stack([dl[:, 1], -dl[:, 0]], -1)
    dir_origin = (0.5 - dl + dperp * (r[:, 0] * 1.415 - 0.7075)[:, None]) * size
    dir_dir = dl
    dir_miss = jnp.zeros((n,), bool)
    if want(LIGHT_DIRECTIONAL):
        # The raw segment sits a full frame outside the target; advance each
        # origin to its frame-entry point (outside is vacuum, so entering
        # unattenuated at the boundary is exact) — keeps wave-0 deposits
        # inside the transport fields instead of clamping onto edge cells.
        # Rays that miss the frame entirely carry zero energy.
        safe = jnp.where(jnp.abs(dl) < 1e-9,
                         jnp.where(dl < 0, -1e-9, 1e-9), dl)
        ta = -dir_origin / safe
        tb = (size - dir_origin) / safe
        t_enter = jnp.max(jnp.minimum(ta, tb), axis=-1)
        t_exit = jnp.min(jnp.maximum(ta, tb), axis=-1)
        dir_miss = t_exit <= jnp.maximum(t_enter, 0.0)
        dir_origin = dir_origin + dl * jnp.maximum(t_enter + 1e-3, 0.0)[:, None]

    # --- Default (:296-304) ---
    def_origin = jnp.stack([r[:, 0] * size[0], jnp.zeros((n,))], -1)
    def_dir = jnp.broadcast_to(jnp.array([0.0, 1.0]), (n, 2))

    def sel(options: dict[int, jax.Array], default: jax.Array) -> jax.Array:
        out = default
        for k, v in options.items():
            if not want(k):
                continue
            out = jnp.where((kind == k)[..., None] if v.ndim == 2 else (kind == k), v, out)
        return out

    origin = sel({LIGHT_POINT: point_origin, LIGHT_SPOT: spot_origin,
                  LIGHT_LASER: laser_origin, LIGHT_AMBIENT: ambient_origin,
                  LIGHT_FIELD: field_origin, LIGHT_DIRECTIONAL: dir_origin}, def_origin)
    direction = sel({LIGHT_POINT: point_dir, LIGHT_SPOT: spot_dir,
                     LIGHT_LASER: laser_dir, LIGHT_AMBIENT: ambient_dir,
                     LIGHT_FIELD: field_dir, LIGHT_DIRECTIONAL: dir_dir}, def_dir)

    rays = jnp.maximum(take_per_light(rays_per_light, l_idx).astype(jnp.float32), 1.0)
    base = (take_per_light(lights.energy, l_idx)
            * (float(width * height) / interval)[..., None] / rays[:, None])
    energy = base * jnp.where((kind == LIGHT_POINT)[:, None], point_scale[:, None], 1.0)
    energy = energy * jnp.where((kind == LIGHT_FIELD)[:, None], field_energy_mod, 1.0)
    energy = jnp.where(((kind == LIGHT_DIRECTIONAL) & dir_miss)[:, None],
                       0.0, energy)

    bounces = jnp.where(override_bounces >= 0, override_bounces,
                        take_per_light(lights.bounces, l_idx))
    return origin, direction, energy, bounces


def emit_point_stratified(lights: Lights, l_of_slot: jax.Array,
                          slots_per_light: jax.Array, n_bins: int,
                          phase: jax.Array, key: jax.Array,
                          target_size: tuple[int, int], interval: jax.Array,
                          override_bounces: jax.Array) -> tuple[jax.Array, ...]:
    """Emit point-light photons in a direction-stratified (D, cap) layout.

    Slot j of every bin d belongs to light l_of_slot[j]; the photon's
    direction is uniform within bin d's angular cone (theta in
    ((d - 1/2 + phase) * 2pi/D, (d + 1/2 + phase) * 2pi/D)), so its
    quantized transport bin is d BY CONSTRUCTION — the per-bin flight can
    process row-blocks without any sort. Stratifying the 2pi of directions
    over D equal cones is an unbiased variance reduction vs. iid sampling
    (the reference emits iid uniform directions, EmitPointLight,
    ForwardMonteCarlo.compute:218-231); positions remain iid disk samples.

    Returns (pos (D, cap, 2), direction (D, cap, 2), energy (D, cap, 3),
    bounces (D, cap)). Light l's total ray count is slots_per_light[l] * D.
    """
    cap = l_of_slot.shape[0]
    height, width = target_size
    aff = take_per_light(lights.affine, l_of_slot)            # (cap, 2, 3)
    e_l = take_per_light(lights.energy, l_of_slot)            # (cap, 3)
    b_l = take_per_light(lights.bounces, l_of_slot)           # (cap,)
    act = take_per_light(lights.active.astype(jnp.float32), l_of_slot)
    rays = jnp.maximum(
        take_per_light(slots_per_light, l_of_slot) * n_bins, 1).astype(jnp.float32)

    u = jax.random.uniform(key, (n_bins, cap, 3))
    disk = unit_from_angle(u[..., 0] * TWO_PI) * jnp.sqrt(u[..., 1])[..., None]
    pos = affine_apply(aff[None], disk)                       # (D, cap, 2)

    bin_width = TWO_PI / n_bins
    d_idx = jnp.arange(n_bins, dtype=jnp.float32)[:, None]
    theta = (d_idx + phase + u[..., 2] - 0.5) * bin_width
    direction = unit_from_angle(theta)

    energy = (e_l[None] * (float(width * height) / interval)
              / (rays[:, None] * TWO_PI) * act[:, None])
    energy = jnp.broadcast_to(energy, (n_bins, cap, 3))
    bounces = jnp.where(override_bounces >= 0, override_bounces, b_l)
    bounces = jnp.broadcast_to(bounces[None], (n_bins, cap))
    return pos, direction, energy, bounces
