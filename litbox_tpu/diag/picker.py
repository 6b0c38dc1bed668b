"""Buffer inspector (reference: Assets/Scripts/SimulationTexturePicker.cs).

Exposes every internal buffer of a running Simulation as a displayable
float image, normalized/tone-mapped the way the reference's picker quad
renders them. `dump_all` writes the full set to PNG for eyeballing.
"""

from __future__ import annotations

import enum
import os

import numpy as np

from ..post.tonemap import tonemap_ue5


class TextureType(enum.Enum):
    HDR = "hdr"
    VARIANCE = "variance"
    IMPORTANCE = "importance"
    FORWARD_ACCUMULATION = "forward_accumulation"
    AI_TONEMAPPED = "ai_tonemapped"
    AI_HDR = "ai_hdr"
    ALBEDO = "albedo"
    TRANSMISSIBILITY = "transmissibility"
    NORMAL_ROUGHNESS = "normal_roughness"
    QUADTREE = "quadtree"
    ANALYSIS_A = "analysis_a"
    ANALYSIS_B = "analysis_b"


def pick(sim, which: TextureType, ai=None) -> np.ndarray:
    """Fetch a named buffer from a Simulation as (H, W, 3) float display RGB.

    `ai` is an optional engine.pipeline.AIAccelerator supplying the AI_HDR /
    AI_TONEMAPPED views (the reference wires the accelerator into the picker
    the same way, SimulationTexturePicker.cs:23,72-77); without one those
    views render black, matching the reference's disabled-AI behavior."""
    import jax.numpy as jnp

    def norm01(x):
        x = np.asarray(x, dtype=np.float32)
        hi = x.max()
        return x / hi if hi > 0 else x

    def gray(x):
        x = np.asarray(x, dtype=np.float32)
        if x.ndim == 2:
            x = np.stack([x] * 3, -1)
        return x

    if which == TextureType.HDR:
        return np.asarray(tonemap_ue5(jnp.asarray(sim.simulation_output_hdr)))
    if which == TextureType.VARIANCE:
        return gray(norm01(sim.variance_map))
    if which == TextureType.IMPORTANCE:
        if sim.importance_map is None:
            # Pyramid generation is consumer-driven: attach as a consumer
            # and compute it on demand (engine keeps it fresh afterwards).
            if sim.refresh_importance_map() is None:
                return np.zeros((sim.height // 2, sim.width // 2, 3), np.float32)
        return gray(norm01(sim.importance_map[0]))
    if which == TextureType.FORWARD_ACCUMULATION:
        # Raw pre-HDR accumulated deposits of tracer A
        # (SimulationTexturePicker.cs:96-97 via ITracerDebug).
        return gray(norm01(sim.tracer_a.forward.raw_accumulation))
    if which == TextureType.AI_HDR:
        if ai is None or ai.hdr_output is None:
            return np.zeros((sim.height, sim.width, 3), np.float32)
        return np.asarray(tonemap_ue5(jnp.asarray(ai.hdr_output)))
    if which == TextureType.AI_TONEMAPPED:
        if ai is None or ai.tonemapped_output is None:
            return np.zeros((sim.height, sim.width, 3), np.float32)
        return np.asarray(ai.tonemapped_output, dtype=np.float32)
    if which == TextureType.ALBEDO:
        return np.asarray(sim.gbuffer.albedo[..., :3])
    if which == TextureType.TRANSMISSIBILITY:
        return gray(sim.gbuffer.transmissibility)
    if which == TextureType.NORMAL_ROUGHNESS:
        n = np.asarray(sim.gbuffer.normal)
        return (n[..., :3] + 1.0) * 0.5
    if which == TextureType.QUADTREE:
        from ..scene.gbuffer import build_pyramid

        pyr = build_pyramid(sim.gbuffer)
        return gray(norm01(pyr.quadtree))
    if which == TextureType.ANALYSIS_A:
        from .analysis import analysis_a

        return gray(norm01(analysis_a(
            jnp.asarray(sim.tracer_a.tracer_output),
            jnp.asarray(sim.tracer_b.tracer_output))))
    if which == TextureType.ANALYSIS_B:
        from .analysis import analysis_a, analysis_b

        a = analysis_a(jnp.asarray(sim.tracer_a.tracer_output),
                       jnp.asarray(sim.tracer_b.tracer_output))
        filtered = analysis_b(a, sim.gbuffer.albedo,
                              jnp.asarray(sim.simulation_output_hdr),
                              jnp.asarray(a))
        return gray(norm01(filtered))
    raise ValueError(which)


def dump_all(sim, folder: str, ai=None) -> list[str]:
    from ..io.images import write_png

    os.makedirs(folder, exist_ok=True)
    paths = []
    for which in TextureType:
        img = pick(sim, which, ai=ai)
        path = os.path.join(folder, f"{which.value}.png")
        write_png(path, np.clip(img, 0, 1), srgb_encode=False)
        paths.append(path)
    return paths
