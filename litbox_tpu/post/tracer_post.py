"""Tracer-pair post-processing: mean, relative temporal variance, mips.

Replaces the fused groupshared kernel `ComputeCVAndNMipsFromSamplePair`
(TracerPostProcessing.compute:80-155): per-pixel mean of the two tracer
outputs, per-pixel relative variance (a-b)^2/(mean^2+1e-5) averaged over
4x4 tiles into a quarter-res CV map, and a box-filter mip chain of the mean.
On TPU this is pure reshaping VPU work that XLA fuses; no shared memory
choreography is needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.sampling import downsample2x_mean
from ..core.types import luminance


def _tile_mean(x: jax.Array, t: int) -> jax.Array:
    h, w = x.shape[0] // t, x.shape[1] // t
    return x[: h * t, : w * t].reshape(h, t, w, t).mean(axis=(1, 3))


@functools.partial(jax.jit, static_argnames=("mip_count",))
def compute_cv_and_mips(source_a: jax.Array, source_b: jax.Array,
                        mip_count: int = 1) -> tuple[jax.Array, jax.Array, tuple]:
    """Returns (mean (H,W,C), cv (H/4,W/4), mips tuple of further levels)."""
    mean = (source_a + source_b) * 0.5
    rel_var = ((source_a - source_b) ** 2 / (mean**2 + 1e-5))[..., :3].mean(-1)
    cv = _tile_mean(rel_var, 4)
    mips = []
    level = mean
    for _ in range(max(0, mip_count - 1)):
        level = downsample2x_mean(level)
        mips.append(level)
    return mean, cv, tuple(mips)


@functools.partial(jax.jit, static_argnames=("levels",))
def importance_pyramid(radiance_a: jax.Array, radiance_b: jax.Array,
                       levels: int = 4) -> tuple[jax.Array, ...]:
    """Half-res luminance(A+B) pyramid with SUM (not mean) reduction
    (ImportanceMap.compute:16-64). Level 0 is half the radiance resolution."""
    lum = luminance(radiance_a[..., :3] + radiance_b[..., :3])
    # Half-res base: the reference samples at uv = id/size with a linear
    # sampler, which lands on texel corners — equivalent to a 2x2 average
    # of the corner neighborhood; a plain box filter is the same statistic.
    base = _tile_mean(lum, 2)
    out = [base]
    for _ in range(levels - 1):
        h, w = out[-1].shape[0] // 2, out[-1].shape[1] // 2
        s = out[-1][: h * 2, : w * 2].reshape(h, 2, w, 2).sum(axis=(1, 3))
        out.append(s)
    return tuple(out)


@jax.jit
def measure_convergence(cv: jax.Array) -> jax.Array:
    """Scalar convergence xi: mean of the CV map.

    The reference accumulates floor(cv*10000) in fixed point and divides by
    10000*W*H (Convergence.compute:10-31, ConvergenceMeasurement.cs:52) —
    i.e. the mean, which float arithmetic gives directly.
    """
    return jnp.mean(cv)
