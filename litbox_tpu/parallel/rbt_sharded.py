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


@functools.partial(jax.jit, static_argnames=("mesh", "height", "width"))
def sharded_rbt_resolve_bins(mesh, fields: RotatedFields, src,
                             height: int, width: int):
    """Bin-axis sharded resolve: 1/n of the scan+rotate work per device.

    `sharded_rbt_resolve` has every device run the FULL (D, S, S) scan +
    rotate-back on its local partial sources and pmean the lightmaps — the
    right trade when tracing dominates. In the realtime regime the resolve
    IS the per-frame bottleneck (VERDICT r2: 9.15 ms of a 35 ms frame at
    quarter-1080p), and its bin axis is embarrassingly parallel: bins are
    independent until the final (H, W, 3) sum (SURVEY section 5 lightmap
    scaling, section 7 step 8). This path:

      1. psum_scatter's the per-device sources over 'data' along the bin
         axis — device i ends with the device-SUM of sources for its
         CONTIGUOUS D/n bin slice (the one large collective, (3*D*S*S)/n
         floats per device riding ICI, overlappable with the next trace);
      2. scans + rotates ONLY those D/n bins locally;
      3. psums the small (H, W, 3) partial lightmaps over 'data'.

    By linearity sum_shards resolve(mean_devices(src)|shard bins) equals
    resolve(mean(src)) equals mean(resolve(src_i)) — i.e. this returns the
    same (E, H, W, 3) as sharded_rbt_resolve to float tolerance while each
    device does 1/n of the resolve compute.

    The per-shard bin angles depend on the device index, so the TPU path
    uses the traced-angle shear rotation (ops/rotate.rotate_bins — the same
    kernel the per-frame jitter phase uses) and off-TPU the per-bin inverse
    rotation gather, with theta_d = (bin + phase) * 2pi/D computed from
    jax.lax.axis_index.
    """
    d_total, s = fields.n_bins, fields.size

    def per_device(src_blk):
        n = jax.lax.axis_size("data")
        i = jax.lax.axis_index("data")
        d_local = d_total // n
        assert d_total % n == 0, (d_total, n)

        # 1) bin-slice of the device-mean sources: (3, D, S, S) -> (3, Dl, S, S)
        src_mean = jax.lax.psum_scatter(
            src_blk[0, 0], "data", scatter_dimension=1, tiled=True) / n
        trans = jax.lax.dynamic_slice_in_dim(
            fields.trans, i * d_local, d_local, axis=0)
        src_local = tuple(src_mean[c] for c in range(3))

        bin_ids = i * d_local + jnp.arange(d_local, dtype=jnp.float32)
        theta = (bin_ids + fields.phase) * (2.0 * jnp.pi / d_total)

        # 2) local scan + rotate-back of the D/n bins
        if jax.default_backend() == "tpu" and s % 128 == 0 and d_local >= 8:
            from ..ops.attnscan import attenuation_scan_rows
            from ..ops.rotate import rotate_bins

            dep = attenuation_scan_rows(trans, *src_local)
            deposited = jnp.stack(dep, axis=-1)  # (Dl, S, S, 3)
            oy = (s - height) // 2
            ox = (s - width) // 2
            lo = (oy // 64) * 64
            hi = min(-(-(oy + height) // 64) * 64, s)
            rotated = rotate_bins(deposited, -theta, reduce_rows=(lo, hi))
            partial = rotated[oy - lo:oy - lo + height, ox:ox + width]
        else:
            sqrt_t = jnp.sqrt(trans)

            def combine(a, b):
                return (a[0] * b[0], a[1] * b[0] + b[1])

            deps = []
            for c in range(3):
                _, dep = jax.lax.associative_scan(
                    combine, (trans, src_local[c] * sqrt_t), axis=2)
                deps.append(dep)
            deposited = jnp.stack(deps, axis=-1)
            ys, xs = jnp.mgrid[0:height, 0:width]
            p = jnp.stack([xs + 0.5, ys + 0.5], -1).reshape(-1, 2).astype(jnp.float32)
            rel = p - fields.center
            cb, sb = jnp.cos(theta), jnp.sin(theta)

            def one(args):
                dep_d, c_d, s_d = args
                xr = c_d * rel[:, 0] + s_d * rel[:, 1] + s / 2.0
                yr = -s_d * rel[:, 0] + c_d * rel[:, 1] + s / 2.0
                from ..ops.resample import gather_bilinear_mxu
                return gather_bilinear_mxu(dep_d, jnp.stack([xr, yr], -1))

            per_bin = jax.lax.map(one, (deposited, cb, sb))
            partial = per_bin.sum(0).reshape(height, width, 3)

        # 3) one small psum completes the bin sum
        raw = jax.lax.psum(partial, "data")
        return raw[None, None]

    raw = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=P("ensemble", "data"),
        out_specs=P("ensemble", "data"),
        check_vma=False,
    )(src)
    return raw[:, 0]
