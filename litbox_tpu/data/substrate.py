"""Procedural training-substrate generator.

Reference: Assets/Scripts/TrainingSubstrate.cs + TrainingSubstrateGenerators.compute.
Pipeline (ForceCreateTexture, TrainingSubstrate.cs:210-324):
  1. shapes      — union of random rects/ellipses minus inverse cutouts
  2. JFA         — jump-flooding distance field from the shape boundary
  3. edge blur   — alpha *= saturate(dist / (edgeBlur + 1))
  4. noise       — multi-octave simplex cloud with floor/ceiling clip
  5. gradient    — 2-color / 2-density linear gradient
  6. hardness    — alpha ^= 10^sharpness

Random parameterization follows GenerateRandom (TrainingSubstrate.cs:65-139),
including the biased NextRange semantics u^(10^-bias) (RandExtensions.cs:12-14).
Deterministic from a uint seed + version.
"""

from __future__ import annotations

import dataclasses
import functools

import colorsys
import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import affine_2x3, affine_inverse
from .noise import snoise01

MAX_SUBSTRATE_SHAPES = 16


@dataclasses.dataclass
class SubstrateParams:
    seed: int = 0
    texture_size: int = 512
    # (kind, inverse) per shape: kind 0=rect, 1=ellipse
    shapes: list = dataclasses.field(default_factory=list)  # dicts: kind, inverse, inv_affine
    edge_blur: float = 10.0
    sharpness: float = 0.0
    has_noise: bool = False
    min_noise_level: int = 0
    max_noise_level: int = 0
    noise_floor: float = 0.0
    noise_ceiling: float = 1.0
    color_a: tuple = (1.0, 1.0, 1.0)
    color_b: tuple = (1.0, 1.0, 1.0)
    density_a: float = 0.1
    density_b: float = 0.01
    gradient_angle: float = 90.0
    gradient_length: float = 0.7


def _next_range(rng, lo, hi, bias=0.0):
    return float(rng.random() ** (10.0 ** -bias) * (hi - lo) + lo)


def generate_random_params(seed: int, version: int = 1, texture_size: int = 512) -> SubstrateParams:
    """Random substrate description (TrainingSubstrate.GenerateRandom :65-139)."""
    rng = np.random.default_rng(seed)
    p = SubstrateParams(seed=seed, texture_size=texture_size)

    n_rects = int(rng.integers(0, 4))
    n_ellipses = int(rng.integers(0, 4))
    n_inv_rects = int(rng.integers(0, 3))
    n_inv_ellipses = int(rng.integers(0, 3))
    if n_rects == 0 and n_ellipses == 0:
        n_rects = 1

    def add(kind, inverse, pos_range, scale_range):
        aff = affine_2x3(
            (_next_range(rng, *scale_range), _next_range(rng, *scale_range)),
            np.deg2rad(_next_range(rng, 0, 360)),
            (_next_range(rng, -pos_range, pos_range), _next_range(rng, -pos_range, pos_range)))
        p.shapes.append(dict(kind=kind, inverse=inverse, inv_affine=affine_inverse(aff)))

    for _ in range(n_rects):
        add(0, False, 0.9, (0.1, 0.7))
    for _ in range(n_ellipses):
        add(1, False, 0.9, (0.1, 1.0))
    for _ in range(n_inv_rects):
        add(0, True, 0.7, (0.1, 0.3))
    for _ in range(n_inv_ellipses):
        add(1, True, 0.7, (0.1, 0.3))

    p.edge_blur = _next_range(rng, 1.0, 128.0, 0.3)
    p.sharpness = _next_range(rng, -1, 1)
    p.has_noise = rng.random() < 0.75
    p.min_noise_level = int(rng.integers(0, 6))
    p.max_noise_level = p.min_noise_level + int(rng.integers(0, 5))
    p.noise_floor = _next_range(rng, 0, 0.6, 0.75)
    p.noise_ceiling = _next_range(rng, 0.6, 1)

    def hsv():
        return colorsys.hsv_to_rgb(rng.random(), _next_range(rng, 0, 1, 0.75),
                                   _next_range(rng, 0.25, 1, 0.75))

    p.color_a = hsv()
    p.color_b = hsv()
    p.density_a = _next_range(rng, 0.01, 0.99)
    p.density_b = _next_range(rng, 0.01, 0.99)
    p.gradient_angle = _next_range(rng, 0, 360)
    p.gradient_length = _next_range(rng, 0.1, 1.4)
    if rng.random() < 0.5:  # no gradient
        p.color_b = p.color_a
        p.density_b = p.density_a

    if version == 2:
        p.min_noise_level = int(rng.integers(0, 3))
        p.max_noise_level = 5 + int(rng.integers(0, 5))
        p.noise_floor = _next_range(rng, 0, 0.3, 0.5)
        p.noise_ceiling = _next_range(rng, 0.85, 1)
    return p


def _pack(params: SubstrateParams):
    n = len(params.shapes)
    kinds = np.zeros(MAX_SUBSTRATE_SHAPES, np.int32)
    inverse = np.zeros(MAX_SUBSTRATE_SHAPES, bool)
    inv_aff = np.tile(np.eye(2, 3, dtype=np.float32), (MAX_SUBSTRATE_SHAPES, 1, 1))
    active = np.zeros(MAX_SUBSTRATE_SHAPES, bool)
    for i, sh in enumerate(params.shapes[:MAX_SUBSTRATE_SHAPES]):
        kinds[i] = sh["kind"]
        inverse[i] = sh["inverse"]
        inv_aff[i] = sh["inv_affine"]
        active[i] = True
    return (jnp.asarray(kinds), jnp.asarray(inverse), jnp.asarray(inv_aff),
            jnp.asarray(active))


@functools.partial(jax.jit, static_argnames=("size", "has_noise", "min_level", "max_level"))
def _generate(kinds, inverse, inv_aff, active, size: int, edge_blur, noise_seed,
              has_noise: bool, min_level: int, max_level: int, noise_floor,
              noise_ceiling, grad_dir, densities, color_a, color_b, hardness):
    ys, xs = jnp.mgrid[0:size, 0:size]
    xy = jnp.stack([(xs + 0.5) / size * 2 - 1, (ys + 0.5) / size * 2 - 1], -1)

    # 1. Shapes (TrainingSubstrateGenerators.compute:28-72).
    inside = jnp.zeros((size, size), bool)
    for i in range(MAX_SUBSTRATE_SHAPES):
        local = jnp.einsum("ij,hwj->hwi", inv_aff[i, :, :2], xy) + inv_aff[i, :, 2]
        rect_in = jnp.max(jnp.abs(local), -1) <= 1.0
        ell_in = jnp.sum(local * local, -1) <= 1.0
        s_in = jnp.where(kinds[i] == 1, ell_in, rect_in)
        add = jnp.where(active[i] & ~inverse[i], inside | s_in, inside)
        cut = jnp.where(active[i] & inverse[i], inside & ~s_in, add)
        inside = cut

    # 2. JFA distance field: inside pixels find the nearest outside pixel
    # (:75-110; ascending power-of-two stages like the reference).
    coord = jnp.stack([xs, ys], -1).astype(jnp.float32)
    seed_xy = jnp.where(inside[..., None], -1.0, coord)

    def jfa_stage(seed_xy, stage):
        best = seed_xy
        best_d = jnp.where(seed_xy[..., 0] < 0, 1e12,
                           jnp.sum((seed_xy - coord) ** 2, -1))
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                cand = jnp.roll(seed_xy, (-dy * stage, -dx * stage), axis=(0, 1))
                d = jnp.where(cand[..., 0] < 0, 1e12, jnp.sum((cand - coord) ** 2, -1))
                take = d < best_d
                best = jnp.where(take[..., None], cand, best)
                best_d = jnp.where(take, d, best_d)
        # Outside pixels keep their own coordinate.
        return jnp.where(inside[..., None], best, seed_xy)

    stage = 1
    while stage < size:
        seed_xy = jfa_stage(seed_xy, stage)
        stage *= 2

    dist = jnp.sqrt(jnp.maximum(jnp.sum((seed_xy - coord) ** 2, -1), 0.0))
    dist = jnp.where(seed_xy[..., 0] < 0, float(size), dist)

    # 3. Edge blur (:113-119).
    alpha = inside.astype(jnp.float32) * jnp.clip(dist / (edge_blur + 1.0), 0.0, 1.0)

    # 4. Noise (:121-146). Octave decorrelation offsets replicate the
    # reference's degenerate Random.Init(0) LCG-on-w sequence.
    if has_noise:
        uv = (jnp.stack([xs + 0.5, ys + 0.5], -1) / size) + noise_seed
        cloud = jnp.zeros((size, size))
        max_amp = 0.0
        amp = 1.0
        w_state = 0
        freq = float(1 << min_level)
        offset = 0.0
        while freq <= float(1 << max_level):
            cloud = cloud + amp * snoise01((uv + offset) * freq)
            max_amp += amp
            amp /= 2.0
            freq *= 2.0
            w_state = (w_state * 1664525 + 1013904223) % (1 << 32)
            offset += 10.0 * float(w_state) * 2.3283064365387e-10
        cloud = cloud / max_amp
        cloud = jnp.clip((cloud - noise_floor) / (noise_ceiling - noise_floor), 0.0, 1.0)
        alpha = alpha * cloud

    # 5. Gradient (:148-166).
    grad = jnp.clip(jnp.einsum("hwi,i->hw", jnp.concatenate(
        [xy, jnp.ones((size, size, 1))], -1), grad_dir), 0.0, 1.0)
    density = densities[0] * (1 - grad) + densities[1] * grad
    color = color_a[None, None] * (1 - grad[..., None]) + color_b[None, None] * grad[..., None]
    net = jnp.where(density > 1.0,
                    alpha * (2.0 - density) + (density - 1.0),
                    alpha * density)

    # 6. Hardness (:168-177).
    net = jnp.maximum(net, 0.0) ** hardness
    return jnp.concatenate([color, net[..., None]], -1)


def generate_texture(params: SubstrateParams) -> jax.Array:
    """(size, size, 4) rgba substrate texture, deterministic from params."""
    kinds, inverse, inv_aff, active = _pack(params)
    seed = np.uint32(params.seed)
    noise_seed = jnp.asarray([float((seed >> np.uint32(16)) & np.uint32(0xFFFF)),
                              float(seed & np.uint32(0xFFFF))], jnp.float32)
    ang = np.deg2rad(params.gradient_angle)
    grad_dir = jnp.asarray([np.cos(ang) / params.gradient_length,
                            np.sin(ang) / params.gradient_length,
                            params.gradient_length / 2.0], jnp.float32)
    return _generate(
        kinds, inverse, inv_aff, active, params.texture_size,
        jnp.float32(params.edge_blur), noise_seed,
        bool(params.has_noise), int(params.min_noise_level), int(params.max_noise_level),
        jnp.float32(params.noise_floor), jnp.float32(params.noise_ceiling),
        grad_dir, jnp.asarray([params.density_a, params.density_b], jnp.float32),
        jnp.asarray(params.color_a, jnp.float32), jnp.asarray(params.color_b, jnp.float32),
        jnp.float32(10.0 ** params.sharpness))


def generate_random(seed: int, version: int = 1, texture_size: int = 512):
    params = generate_random_params(seed, version, texture_size)
    return params, generate_texture(params)
