"""Multi-chip scaling via jax.sharding meshes + XLA collectives.

The reference is single-GPU/single-process (SURVEY.md section 2.8) — its only
parallelism is thread-level over photons. The TPU-native scaling model:

  * photon batch  -> sharded over the mesh 'data' axis (pure data parallel,
    each chip traces an independent sub-batch)
  * ensemble axis (the dual-tracer variance pair) -> 'ensemble' mesh axis
  * lightmap accumulators -> psum over ICI at the end of the frame
  * GBuffer/scene -> replicated (small)

Each shard traces a full independent estimate of the frame (its photons carry
energy normalized to the shard size), so the cross-chip combine is a MEAN —
one `psum` of the (H, W, 3) accumulator per frame rides the ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.types import GBuffer
from ..sim.oracle import trace_frame


def make_mesh(n_devices: int | None = None, ensemble: int = 1) -> Mesh:
    devices = jax.devices()[: n_devices or len(jax.devices())]
    import numpy as np

    n = len(devices)
    if n % ensemble:
        raise ValueError(f"{n} devices not divisible by ensemble={ensemble}")
    arr = np.asarray(devices).reshape(ensemble, n // ensemble)
    return Mesh(arr, axis_names=("ensemble", "data"))


@functools.partial(jax.jit, static_argnames=(
    "mesh", "n_photons", "interval", "max_bounces", "bilinear"))
def sharded_trace_frame(mesh: Mesh, gbuffer: GBuffer, lights, field_textures,
                        brdf_lut, key, n_photons: int, interval: float, override_bounces,
                        max_bounces: int = 4, bilinear: bool = True):
    """Trace `n_photons` per chip on every chip of the mesh; mean-reduce the
    lightmaps over 'data', keep the 'ensemble' axis separate.

    Returns (raw (E, H, W, 3), writes (E,)) — one lightmap per ensemble row.
    """
    e = mesh.shape["ensemble"]
    d = mesh.shape["data"]
    keys = jax.random.split(key, e * d).reshape(e, d)

    def per_device(keys_block):
        raw, wc = trace_frame(gbuffer, lights, field_textures, brdf_lut,
                              keys_block.reshape(()), n_photons, interval,
                              override_bounces, max_bounces=max_bounces,
                              bilinear=bilinear)
        raw = jax.lax.pmean(raw, "data")
        wc = jax.lax.psum(wc, "data")
        return raw[None, None], wc[None, None]

    raw, wc = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=P("ensemble", "data"),
        out_specs=(P("ensemble", "data"), P("ensemble", "data")),
        check_vma=False,  # scan carries mix varying/unvarying leaves
    )(keys)
    # The 'data' axis is fully reduced inside the shard; take its first slot.
    return raw[:, 0], wc.sum(axis=1)
