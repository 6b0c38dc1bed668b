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
import math

import jax
import jax.numpy as jnp

from ..core.sampling import sample_bilinear_uv
from ..core.types import GBuffer
from ..ops.resample import gather_bilinear_mxu
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


# Coprime stride so the bin ladder covers direction space near-uniformly
# long before a full cycle completes (backward_bin_for_frame).
_BIN_STRIDE = 47


def backward_bin_for_frame(frame: int, n_bins: int) -> int:
    """Direction bin for backward frame f: a coprime-stride ladder that
    visits every bin exactly once per n_bins frames (deterministic cubature
    — after a full cycle the accumulated gather is the exact integral over
    the D-quantized direction fan, with zero angular sampling noise).

    The stride is searched upward from _BIN_STRIDE until gcd(stride,
    n_bins) == 1 (a fixed +2 fallback is NOT coprime for e.g.
    n_bins = 329 = 7*47, where gcd(49, 329) = 7 would visit only 1/7 of
    the fan and bias the accumulated gather to a direction subset)."""
    stride = _BIN_STRIDE
    while math.gcd(stride, n_bins) != 1:
        stride += 2
    return (frame * stride) % n_bins


@functools.partial(jax.jit, static_argnames=("block",))
def backward_gather_rbt(fields, gbuffer: GBuffer, forward_hdr: jax.Array,
                        bin_index, block: int = 128) -> jax.Array:
    """One backward frame on the rotated-bin transport engine.

    The reference shoots one importance-lobed ray per pixel per frame and
    stratified-samples the gather integral along it
    (BackwardMonteCarlo.compute:62-76); its temporal accumulator converges
    to the uniform direction average of the per-ray integral (the lobe is
    importance-only — its inverse-density weight cancels the lobe pdf).
    Here each frame instead evaluates the EXACT gather integral along ONE
    direction bin for every pixel at once, and the frame ladder
    (backward_bin_for_frame) averages the bins — the same limit, with zero
    radial noise and deterministic direction coverage.

    In bin b's rotated frame every ray is a +x row, so for all rows y:

        out[y, x0] = sum_{x > x0} exp(C[y,x] - C[y,x0]) / (x - x0)^2
                     * L_rot[y, x]

    an upper-triangular Toeplitz (1/r^2) contraction with exponential
    attenuation. exp(C[x] - C[x0]) would overflow f32 if factored naively
    (C spans hundreds of nats); rebasing per `block` columns keeps every
    exponent clipped <= 0:  C[x]-C[x0] = (C[x]-C_j0) + (C_j0-C[x0]) with
    C_j0 the start of x's block (>= both when the blocks differ). Within-
    block pairs use their exact difference. All work is dense batched
    matmuls over rows — MXU-bound at ~2.5 GFLOP/frame at 256^2.
    """
    height, width = gbuffer.transmissibility.shape
    s = fields.size
    nb = s // block
    assert nb * block == s, "field size must be a multiple of block"

    cb = fields.cos[bin_index]
    sb = fields.sin[bin_index]
    c = jnp.take(fields.cum_log, bin_index, axis=0)            # (S, S)

    # --- rotate the radiance field into the bin frame ---
    xs = jnp.arange(s, dtype=jnp.float32) + 0.5 - s / 2.0
    rx = xs[None, :]
    ry = xs[:, None]
    px = cb * rx - sb * ry + fields.center[0]
    py = sb * rx + cb * ry + fields.center[1]
    pts = jnp.stack([px, py], -1).reshape(-1, 2)
    l_rot = gather_bilinear_mxu(forward_hdr[..., :3], pts).reshape(s, s, 3)

    cblk = c.reshape(s, nb, block)
    lblk = l_rot.reshape(s, nb, block, 3)
    c_j0 = cblk[:, :, 0]                                        # (S, nb)

    # Within-block pairs: exact exponent differences.
    ar = jnp.arange(block, dtype=jnp.float32)
    du = ar[None, :] - ar[:, None]                              # b - a
    k128 = jnp.where(du > 0, 1.0 / jnp.maximum(du, 1.0) ** 2, 0.0)
    pair = jnp.exp(jnp.clip(cblk[:, :, None, :] - cblk[:, :, :, None],
                            -60.0, 0.0)) * k128                 # (S, nb, bl, bl)
    out = jnp.einsum("yjab,yjbc->yjac", pair, lblk).reshape(s, s, 3)

    # Cross-block: rebased at each source block's start.
    x0s = jnp.arange(s, dtype=jnp.float32)
    ej = jnp.exp(jnp.clip(cblk - c_j0[:, :, None], -60.0, 0.0))[..., None] * lblk
    for j in range(1, nb):
        xj = j * block + jnp.arange(block, dtype=jnp.float32)
        kj = jnp.where(xj[None, :] > x0s[:, None],
                       1.0 / jnp.maximum(xj[None, :] - x0s[:, None], 1.0) ** 2,
                       0.0)                                     # (S, block)
        pj = jnp.einsum("xb,ybc->yxc", kj, ej[:, j])            # (S, S, 3)
        w = jnp.exp(jnp.clip(c_j0[:, j:j + 1] - c, -60.0, 0.0))
        w = jnp.where(x0s[None, :] < j * block, w, 0.0)         # later x0: within
        out = out + w[..., None] * pj

    # --- sample the per-pixel result back in the target frame ---
    ys, xs2 = jnp.mgrid[0:height, 0:width]
    pix = jnp.stack([xs2 + 0.5, ys + 0.5], -1).reshape(-1, 2).astype(jnp.float32)
    rel = pix - fields.center
    xr = cb * rel[:, 0] + sb * rel[:, 1] + s / 2.0
    yr = -sb * rel[:, 0] + cb * rel[:, 1] + s / 2.0
    gathered = gather_bilinear_mxu(
        out, jnp.stack([xr, yr], -1)).reshape(height, width, 3)

    albedo = gbuffer.albedo[..., :3]
    outscatter = (1.0 - gbuffer.transmissibility)[..., None]
    direct = forward_hdr[..., :3]
    return (gathered * albedo + direct) * outscatter
