"""Core pytree types and constants.

The reference's scene graph is Unity components (`Assets/Scripts/Lights/*.cs`,
`Assets/Scripts/Shapes/*.cs`); here scenes are static-shape struct-of-array
pytrees so a single jitted trace covers any scene up to the padded capacity.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


def pytree_dataclass(cls=None, *, meta_fields: tuple[str, ...] = ()):
    """Register a dataclass as a JAX pytree with optional static (meta) fields."""

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = tuple(f.name for f in dataclasses.fields(c) if f.name not in meta_fields)
        return jax.tree_util.register_dataclass(c, data_fields=data_fields, meta_fields=meta_fields)

    return wrap(cls) if cls is not None else wrap


# Light kinds (reference kernel dispatch: ForwardMonteCarlo.compute:341-355).
LIGHT_DEFAULT = 0
LIGHT_POINT = 1
LIGHT_SPOT = 2
LIGHT_LASER = 3
LIGHT_AMBIENT = 4
LIGHT_FIELD = 5
LIGHT_DIRECTIONAL = 6
NUM_LIGHT_KINDS = 7

# Shape kinds (reference: Assets/Scripts/Shapes).
SHAPE_RECT = 0
SHAPE_ELLIPSE = 1
SHAPE_SPRITE = 2

LUMINANCE_WEIGHTS = jnp.array([0.2126, 0.7152, 0.0722], dtype=jnp.float32)
INTENSITY_WEIGHTS = jnp.array([0.299, 0.587, 0.114], dtype=jnp.float32)


@pytree_dataclass(meta_fields=("frame_limit", "rays_per_frame", "photon_bounces"))
class SimulationProfile:
    """Run profile (reference: Simulation.cs:12-18)."""

    frame_limit: int = -1
    rays_per_frame: int = 65536
    integration_interval: float = 0.1
    photon_bounces: int = -1  # -1: use each light's own bounce count


@dataclasses.dataclass(frozen=True)
class Realtime1080pProfile:
    """THE production 1080p configuration, pinned in one place.

    The reference binds the simulation to the camera at quarter resolution
    (BindSimulationToCamera.cs:6 resolutionScale = 1/4) and budgets 65,536
    realtime rays (Simulation.cs:43). This profile is its TPU analog and is
    the single source of truth for every 1080p benchmark and quality table:
    benchmarks must not re-pick these knobs per run (a round-3 sweep closed
    its FPS gap by halving bounce photons between two logged runs — the
    kind of drift this pin prevents). 262,144 direct + 32,768 bounce rays
    per tracer-pair frame is 4.5x the reference's realtime ray budget.
    """

    sim_width: int = 480          # quarter-res 1080p, rounded to /16
    sim_height: int = 272
    out_width: int = 1920
    out_height: int = 1088
    photons: int = 262_144        # direct stratified rays per frame (pair total)
    bounce_photons: int = 32_768  # MC bounce rays per frame (pair total)
    n_bins: int = 128             # RBT angular bins
    resolve_groups: int = 16      # group-interleaved display resolve (1/K cost)
    bf16_display: bool = True     # denoiser + display stage precision
    denoiser: str = "rgb"         # one UNet pass per frame (RGB variant)


REALTIME_1080P = Realtime1080pProfile()


@pytree_dataclass
class GBuffer:
    """Rasterized scene fields (reference: SimulationCamera.cs:7-19).

    albedo          (H, W, 4) premultiplied rgb + alpha; cleared (0,0,0,1)
    transmissibility(H, W)    per-texel transmissibility product; cleared 1
    normal          (H, W, 4) (nx, ny, nz, alignment); cleared 0
    """

    albedo: jax.Array
    transmissibility: jax.Array
    normal: jax.Array

    @property
    def height(self) -> int:
        return self.albedo.shape[0]

    @property
    def width(self) -> int:
        return self.albedo.shape[1]


@pytree_dataclass
class GBufferPyramid:
    """Custom transmissibility mip chain (reference: GBuffer.compute:31-61).

    Each level is (h, w, 4): (average, pairwise-min, variance, leaf-flag).
    Level 0 mirrors the full-res transmissibility with variance/leaf in z/w.
    """

    levels: tuple[jax.Array, ...]
    quadtree: jax.Array  # (H, W) leaf lod per texel (GBuffer.compute:109-120)


def luminance(rgb: jax.Array) -> jax.Array:
    """Rec.709 luminance (LitboxCommon.cginc:103-105)."""
    return jnp.einsum("...c,c->...", rgb, LUMINANCE_WEIGHTS)


def affine_2x3(scale=(1.0, 1.0), rotation: float = 0.0, translation=(0.0, 0.0)) -> Any:
    """Build a 2x3 local->target affine: T @ R @ S (column-vector convention)."""
    import numpy as np

    c, s = np.cos(rotation), np.sin(rotation)
    sx, sy = scale
    return np.array(
        [[c * sx, -s * sy, translation[0]],
         [s * sx, c * sy, translation[1]]],
        dtype=np.float32,
    )


def affine_apply(m: jax.Array, p: jax.Array) -> jax.Array:
    """Apply (..., 2, 3) affine to (..., 2) points."""
    return jnp.einsum("...ij,...j->...i", m[..., :2], p) + m[..., 2]


def affine_linear(m: jax.Array, v: jax.Array) -> jax.Array:
    """Apply only the linear part to (..., 2) vectors."""
    return jnp.einsum("...ij,...j->...i", m[..., :2], v)


def affine_inverse(m) -> Any:
    """Invert a 2x3 affine (numpy, host-side)."""
    import numpy as np

    m = np.asarray(m, dtype=np.float32)
    lin = np.linalg.inv(m[:2, :2])
    return np.concatenate([lin, -(lin @ m[:2, 2:3])], axis=1).astype(np.float32)
