"""Multi-chip sharding for the production RBT engine.

The oracle sharding (parallel/sharded.py) covers the reference-semantics
tracer; this module shards the flagship rotated-bin transport engine
(sim/rbt.py) the same TPU-native way (SURVEY.md sections 2.8 and 7 step 8):

  * photon batch      -> 'data' mesh axis; every device traces an
                         independent full estimate of the frame into its OWN
                         per-device source buffers (3 x (D, S, S)). Source
                         accumulation is linear, so nothing crosses ICI
                         during tracing — frames accumulate locally.
  * dual-tracer pair  -> 'ensemble' mesh axis (variance estimation).
  * resolve           -> scan + rotate-back run per device on the local
                         sources, then ONE pmean of the small (H, W, 3)
                         lightmap rides the ICI. Resolving before reducing
                         exploits linearity of the resolve: mean(resolve(s_i))
                         == resolve(mean(s_i)) while moving (H*W*3) floats
                         instead of (3*D*S*S) — ~250x less collective traffic
                         at 256^2 / 128 bins.
  * fields / GBuffer / scene -> replicated (closure capture).

Per-device sources are carried as (E, Dd, 3, D, S, S) arrays sharded
P('ensemble', 'data') on the leading axes, so they live entirely on their
device and persist across frames (the accumulate-then-resolve design of
sim/rbt.py is preserved across the mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.types import GBuffer
from ..sim.rbt import RotatedFields, rbt_trace_frame, resolve_raw


def zero_sources_sharded(mesh, fields: RotatedFields):
    """Per-device source buffers (E, Dd, 3, D, S, S), sharded over the mesh."""
    e, d = mesh.shape["ensemble"], mesh.shape["data"]
    db, s = fields.n_bins, fields.size
    zeros = jnp.zeros((e, d, 3, db, s, s))
    return jax.device_put(zeros, NamedSharding(mesh, P("ensemble", "data")))


@functools.partial(jax.jit, static_argnames=(
    "mesh", "n_photons", "max_bounces", "analytic_direct", "bounce_photons",
    "mc_direct", "enable_brdf", "light_kinds"),
    donate_argnames=("src",))
def sharded_rbt_trace_frame(mesh, fields: RotatedFields, src, gbuffer: GBuffer,
                            lights, field_textures, brdf_lut, key,
                            n_photons: int, override_bounces,
                            max_bounces: int = 4, analytic_direct: bool = True,
                            bounce_photons: int = 0, mc_direct: bool = True,
                            enable_brdf: bool = True,
                            light_kinds: tuple | None = None):
    """Trace `n_photons` per device into the per-device source buffers.

    Purely local — no collective is issued; returns (src, photons_emitted)
    where photons_emitted counts across the 'data' axis of one ensemble row.
    """
    e, d = mesh.shape["ensemble"], mesh.shape["data"]
    keys = jax.random.split(key, e * d).reshape(e, d)

    def per_device(keys_blk, src_blk):
        src_local = tuple(src_blk[0, 0, c] for c in range(3))
        out, n = rbt_trace_frame(
            fields, src_local, gbuffer, lights, field_textures, brdf_lut,
            keys_blk.reshape(()), n_photons, override_bounces,
            max_bounces=max_bounces, analytic_direct=analytic_direct,
            bounce_photons=bounce_photons, mc_direct=mc_direct,
            enable_brdf=enable_brdf, light_kinds=light_kinds)
        n = jax.lax.psum(n, "data")
        return jnp.stack(out)[None, None], n[None, None]

    src, n = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P("ensemble", "data"), P("ensemble", "data")),
        out_specs=(P("ensemble", "data"), P("ensemble", "data")),
        check_vma=False,
    )(keys, src)
    return src, n[:, 0]


@functools.partial(jax.jit, static_argnames=("mesh", "height", "width"))
def sharded_rbt_resolve(mesh, fields: RotatedFields, src,
                        height: int, width: int):
    """Resolve per-device sources locally, pmean lightmaps over 'data'.

    Returns (E, H, W, 3) — one lightmap per ensemble row (the dual-tracer
    pair for variance estimation, Simulation.cs:78).
    """

    def per_device(src_blk):
        src_local = tuple(src_blk[0, 0, c] for c in range(3))
        raw = resolve_raw(fields, src_local, height, width)
        raw = jax.lax.pmean(raw, "data")
        return raw[None, None]

    raw = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=P("ensemble", "data"),
        out_specs=P("ensemble", "data"),
        check_vma=False,
    )(src)
    return raw[:, 0]
