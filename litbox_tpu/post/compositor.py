"""Scene composition (reference: Assets/Shaders/SimulationCompositor.shader).

The compositor quad writes float4(hdr.rgb, 0) with Blend One OneMinusSrcAlpha:
with src alpha 0 this is additive light injection over the backdrop.
"""

from __future__ import annotations

import jax


def composite_additive(background: jax.Array, hdr: jax.Array) -> jax.Array:
    """dst * (1 - 0) + src = background + hdr (SimulationCompositor.shader:46-57)."""
    return background + hdr


def composite_premultiplied(background: jax.Array, rgba: jax.Array) -> jax.Array:
    """General premultiplied-over blend for layered content."""
    return rgba[..., :3] + background * (1.0 - rgba[..., 3:4])
