"""Diagnostic analysis filters (reference: Assets/Resources/Analysis.compute,
Assets/Scripts/AnalysisParameters.cs) — the prototype classical denoiser /
adaptive-sampling path."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.types import luminance


@dataclasses.dataclass(frozen=True)
class AnalysisParameters:
    """Tunables (AnalysisParameters.cs:3-14)."""

    sigma_spatial: float = 1.2
    sigma_albedo: float = 0.05
    sigma_luminance_tight: float = 0.05
    sigma_luminance_loose: float = 2.5
    k_luminance: float = 2.0


@jax.jit
def analysis_a(hdr_a: jax.Array, hdr_b: jax.Array) -> jax.Array:
    """Full-res relative variance of the tracer pair (Analysis.compute:27-41)."""
    mean = (hdr_a + hdr_b) / 2.0
    rel = ((hdr_a - hdr_b) ** 2 / (mean**2 + 1e-5))[..., :3].mean(-1)
    return rel


def _gw(delta, sigma):
    return jnp.exp(-0.5 * delta * delta / (sigma * sigma))


def _smoothstep(lo, hi, x):
    t = jnp.clip((x - lo) / (hi - lo), 0.0, 1.0)
    return t * t * (3 - 2 * t)


def analysis_b(previous: jax.Array, albedo: jax.Array, hdr_final: jax.Array,
               variance: jax.Array,
               params: AnalysisParameters = AnalysisParameters()) -> jax.Array:
    """5x5 edge-preserving bilateral filter of the variance field with
    spatial/albedo/adaptive-luminance Gaussian weights (Analysis.compute:48-87)."""
    sig_adaptive = params.sigma_luminance_tight + (
        params.sigma_luminance_loose - params.sigma_luminance_tight
    ) * _smoothstep(0.0, 1.0 / params.k_luminance, variance)

    lum = luminance(hdr_final[..., :3])
    total_w = jnp.zeros_like(lum)
    out = jnp.zeros_like(previous)

    def shifted(x, dy, dx):
        return jnp.roll(x, (-dy, -dx), axis=(0, 1))

    for j in range(-2, 3):
        for i in range(-2, 3):
            spatial = float(jnp.exp(-0.5 * (i * i + j * j) / params.sigma_spatial**2))
            albedo_w = _gw(jnp.linalg.norm(
                shifted(albedo[..., :3], j, i) - albedo[..., :3], axis=-1),
                params.sigma_albedo)
            lum_w = _gw(jnp.abs(shifted(lum, j, i) - lum), sig_adaptive)
            w = spatial * albedo_w * lum_w
            total_w = total_w + w
            out = out + shifted(previous, j, i) * (w[..., None] if previous.ndim == 3 else w)

    return out / (total_w[..., None] if previous.ndim == 3 else total_w)
