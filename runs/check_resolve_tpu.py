"""On-chip numerics check: TPU resolve_raw (Pallas scan + planar rotate)
vs the CPU reference path (associative_scan + dense tent-matmul gather)
on a real traced scene, static and traced-phase.

Usage: python runs/check_resolve_tpu.py
"""
import subprocess
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def cpu_reference(npz_path: str):
    """Run the CPU path in a subprocess (jax platform is process-global)."""
    code = f"""
import sys; sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from litbox_tpu.sim import rbt
d = np.load("{npz_path}")
fields = rbt.RotatedFields(
    cos=jnp.asarray(d["cos"]), sin=jnp.asarray(d["sin"]),
    trans=jnp.asarray(d["trans"]), cum_log=jnp.asarray(d["cum_log"]),
    cum_coarse=jnp.asarray(d["cum_coarse"]), center=jnp.asarray(d["center"]),
    phase=jnp.asarray(d["phase"]))
src = tuple(jnp.asarray(d[f"src{{c}}"]) for c in range(3))
h, w = int(d["h"]), int(d["w"])
raw = rbt.resolve_raw(fields, src, h, w, traced_phase=bool(d["traced"]))
np.save("{npz_path}.cpu.npy", np.asarray(raw))
"""
    subprocess.run([sys.executable, "-c", code], check=True)
    return np.load(npz_path + ".cpu.npy")


def main():
    import jax
    import jax.numpy as jnp

    from litbox_tpu.core import luts
    from litbox_tpu.scene import SceneBuilder, rasterize
    from litbox_tpu.sim import rbt

    assert jax.default_backend() == "tpu", jax.default_backend()
    H, W = 120, 144
    b = SceneBuilder(texture_size=64)
    b.add_point_light((W * 0.5, H * 0.55), radius=3.0, color=(1.0, 0.85, 0.6),
                      intensity=2.0, bounces=2)
    b.add_rect((W * 0.7, H * 0.4), (14, 8), rotation=0.5, color=(1, .3, .3, 1),
               log_density=-1.0)
    scene = b.build(max_lights=2, max_shapes=2)
    gb = rasterize(scene, H, W)
    brdf = jnp.asarray(luts.brdf_lut())
    key = jax.random.key(0)

    for traced, phase in ((False, 0.0), (True, 0.43)):
        fields = rbt.precompute_rotated_fields(gb, n_bins=32, phase=phase)
        src = rbt.zero_sources(fields)
        src, _ = rbt.rbt_trace_frame(
            fields, src, gb, scene.lights, scene.field_textures, brdf, key,
            32768, jnp.int32(-1), max_bounces=2, bounce_photons=8192,
            mc_direct=True, analytic_direct=False, enable_brdf=False,
            light_kinds=(1,), hist_direct=True)
        tpu_raw = np.asarray(rbt.resolve_raw(fields, src, H, W,
                                             traced_phase=traced))
        path = "/tmp/resolve_check.npz"
        np.savez(path, cos=np.asarray(fields.cos), sin=np.asarray(fields.sin),
                 trans=np.asarray(fields.trans),
                 cum_log=np.asarray(fields.cum_log),
                 cum_coarse=np.asarray(fields.cum_coarse),
                 center=np.asarray(fields.center),
                 phase=np.asarray(fields.phase),
                 src0=np.asarray(src[0]), src1=np.asarray(src[1]),
                 src2=np.asarray(src[2]), h=H, w=W, traced=traced)
        cpu_raw = cpu_reference(path)
        scale = max(float(np.abs(cpu_raw).max()), 1e-6)
        mad = float(np.abs(tpu_raw - cpu_raw).mean()) / scale
        mass = float(tpu_raw.sum() / max(cpu_raw.sum(), 1e-6))
        print(f"traced={traced}: rel mean-abs-diff {mad:.5f}  mass ratio {mass:.5f}",
              flush=True)
        # shear-lattice vs dense-gather bilinear differences only
        assert mad < 0.01 and abs(mass - 1) < 0.02, (mad, mass)
    print("OK: TPU resolve matches CPU reference (static + traced phase)")

    # Grouped partition on-chip at production bin count: sum of the K group
    # resolves == the full resolve for every K the display path may use,
    # including K=16 (8 bins/group — the relaxed fast-path gate).
    fields = rbt.precompute_rotated_fields(gb, n_bins=128)
    src = rbt.zero_sources(fields)
    src, _ = rbt.rbt_trace_frame(
        fields, src, gb, scene.lights, scene.field_textures, brdf, key,
        32768, jnp.int32(-1), max_bounces=2, bounce_photons=8192,
        mc_direct=True, analytic_direct=False, enable_brdf=False,
        light_kinds=(1,), hist_direct=True)
    full = np.asarray(rbt.resolve_raw(fields, src, H, W))
    scale = max(float(np.abs(full).max()), 1e-6)
    for k in (4, 8, 16):
        parts = sum(np.asarray(rbt.resolve_raw(fields, src, H, W,
                                               group=t, n_groups=k))
                    for t in range(k))
        mad = float(np.abs(parts - full).mean()) / scale
        print(f"groups={k}: rel mean-abs-diff vs full {mad:.7f}", flush=True)
        assert mad < 1e-4, (k, mad)
    print("OK: grouped partition exact on-chip (K=4/8/16, D=128)")


if __name__ == "__main__":
    main()
