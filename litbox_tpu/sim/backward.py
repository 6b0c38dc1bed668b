"""Backward (camera-side) Monte Carlo gather.

Reference: BackwardMonteCarlo.compute:18-124 + BackwardMonteCarlo.cs.
One ray per output pixel per frame: jittered pixel origin, importance-lobed
direction toward the frame center (teardrop LUT), marched to the frame edge
gathering the forward pass's HDR radiance at stratified intervals weighted by
cumulative transmissibility and 1/r^2. The result composes with the direct
forward light and local outscatter:
  out = (gathered * albedo * lobe_weight + direct) * (1 - T_local)
and is temporally accumulated then divided by the frame count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.sampling import sample_bilinear_uv
from ..core.types import GBuffer
from .materials import scatter_importance_lobed
from .oracle import _escape_distance, _nonzero_dir


@functools.partial(jax.jit, static_argnames=("max_steps",))
def backward_gather(gbuffer: GBuffer, forward_hdr: jax.Array, teardrop_lut: jax.Array,
                    key: jax.Array, interval, importance_target_uv=(0.5, 0.5),
                    max_steps: int = 0) -> jax.Array:
    """One backward-gather frame: returns the (H, W, 3) sample to accumulate."""
    height, width = gbuffer.transmissibility.shape
    if max_steps <= 0:
        max_steps = int((height**2 + width**2) ** 0.5) + 4
    size = jnp.array([width, height], dtype=jnp.float32)
    pixel = 1.0 / size

    k_jitter, k_lobe, k_strat = jax.random.split(key, 3)

    ys, xs = jnp.mgrid[0:height, 0:width]
    base = jnp.stack([xs, ys], axis=-1).astype(jnp.float32).reshape(-1, 2)
    n = base.shape[0]
    origin = base + jax.random.uniform(k_jitter, (n, 2))

    target = jnp.asarray(importance_target_uv, jnp.float32) * size
    direction, lobe_w = scatter_importance_lobed(
        teardrop_lut, origin, target, jax.random.uniform(k_lobe, (n,)))

    d = _nonzero_dir(direction)
    origin_uv = origin / size
    dir_uv = d / size
    uesc = _escape_distance(origin_uv, dir_uv, pixel)
    interval = jnp.asarray(interval, jnp.float32)

    def step(carry, k):
        trans, gathered, u_target, sample_idx, key = carry
        u_next = (k + 1).astype(jnp.float32)
        uv_sample = origin_uv + dir_uv * k.astype(jnp.float32)
        t = sample_bilinear_uv(gbuffer.transmissibility, uv_sample)
        active = u_next <= uesc
        trans = jnp.where(active, trans * t, trans)

        # Post-propagate state: testUV and uHitCurrent sit at u = k+1
        # (SimulationCommon.cginc:426-431) when the gather loop runs
        # (BackwardMonteCarlo.compute:62-76).
        uv_gather = origin_uv + dir_uv * u_next[None]
        radiance = sample_bilinear_uv(forward_hdr, uv_gather)[..., :3]
        geom = interval / (1e-5 + u_next * u_next)

        key, ka, kb = jax.random.split(key, 3)
        for kd in (ka, kb):
            fire = active & (u_next > u_target)
            gathered = gathered + jnp.where(
                fire[:, None], radiance * (trans * geom)[:, None], 0.0)
            xi = jax.random.uniform(kd, (n,))
            sample_idx = jnp.where(fire, sample_idx + 1.0, sample_idx)
            u_target = jnp.where(fire, (sample_idx + xi) * interval, u_target)

        return (trans, gathered, u_target, sample_idx, key), None

    k0, k_strat = jax.random.split(k_strat)
    init = (jnp.ones((n,)), jnp.zeros((n, 3)),
            jax.random.uniform(k0, (n,)) * interval, jnp.zeros((n,)), k_strat)
    (_, gathered, _, _, _), _ = jax.lax.scan(step, init, jnp.arange(max_steps))

    gathered = gathered.reshape(height, width, 3)
    lobe_w = lobe_w.reshape(height, width, 1)
    albedo = gbuffer.albedo[..., :3]
    outscatter = (1.0 - gbuffer.transmissibility)[..., None]
    direct = forward_hdr[..., :3]
    return (gathered * albedo * lobe_w + direct) * outscatter
