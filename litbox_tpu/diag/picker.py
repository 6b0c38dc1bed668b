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
    ALBEDO = "albedo"
    TRANSMISSIBILITY = "transmissibility"
    NORMAL_ROUGHNESS = "normal_roughness"
    QUADTREE = "quadtree"
    ANALYSIS_A = "analysis_a"
    ANALYSIS_B = "analysis_b"


def pick(sim, which: TextureType) -> np.ndarray:
    """Fetch a named buffer from a Simulation as (H, W, 3) float display RGB."""
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
            return np.zeros((sim.height // 2, sim.width // 2, 3), np.float32)
        return gray(norm01(sim.importance_map[0]))
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


def dump_all(sim, folder: str) -> list[str]:
    from ..io.images import write_png

    os.makedirs(folder, exist_ok=True)
    paths = []
    for which in TextureType:
        img = pick(sim, which)
        path = os.path.join(folder, f"{which.value}.png")
        write_png(path, np.clip(img, 0, 1), srgb_encode=False)
        paths.append(path)
    return paths
