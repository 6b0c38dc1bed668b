"""On-chip numbers for the DOM bounce cascade (VERDICT r3 next #8).

Times, at the bench configuration (256^2 scene, S=384, D=128, 2M photons,
2 bounces, point light in cloud):

  mc_frame   — production MC frame: hist direct + 524K roulette chains
  direct     — direct-only frame (what DOM mode traces per frame)
  cascade    — dom_bounce_sources(n_waves=1) + its resolve (the refresh)

and derives effective photons/s for cascade cadences 1 (every frame) and
8 (the integrator default dom_refresh). All timings use the bench.py
tunnel methodology (chained scan where possible, RTT subtraction).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import BOUNCE_RAYS, FRAMES, RAYS_PER_FRAME, build_scene, measure_rtt

RESOLUTION = 256
N_BINS = 128


def main():
    from litbox_tpu.core import luts
    from litbox_tpu.sim import rbt
    from litbox_tpu.sim.dom import dom_bounce_sources

    scene, gb = build_scene(RESOLUTION)
    brdf = jnp.asarray(luts.brdf_lut())
    fields = rbt.precompute_rotated_fields(gb, n_bins=N_BINS)
    print("normal-free:", float(jnp.abs(gb.normal[..., :2]).max()) == 0.0,
          flush=True)

    def frames_fn(max_bounces, bounce):
        @jax.jit
        def run(fields, src, key):
            def body(src, i):
                src, n = rbt.rbt_trace_frame(
                    fields, src, gb, scene.lights, scene.field_textures,
                    brdf, jax.random.fold_in(key, i), RAYS_PER_FRAME,
                    jnp.int32(-1), max_bounces=max_bounces,
                    bounce_photons=bounce, mc_direct=True,
                    analytic_direct=False, enable_brdf=False,
                    light_kinds=(1,), hist_direct=True)
                return src, n
            src, _ = jax.lax.scan(body, src, jnp.arange(FRAMES))
            return src[0][0, 0, 0]
        return run

    @jax.jit
    def cascade(fields, src):
        dom_src = dom_bounce_sources(fields, gb, src, n_waves=1)
        raw = rbt.resolve_raw(fields, dom_src, RESOLUTION, RESOLUTION)
        return raw[0, 0, 0]

    rtt = measure_rtt()
    print(f"rtt {rtt*1000:.1f} ms", flush=True)

    def time_fn(name, fn, *args, per=1):
        float(fn(*args))
        float(fn(*args))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(*args))
            best = min(best, time.perf_counter() - t0 - rtt)
        print(f"{name}: {best/per*1000:8.2f} ms", flush=True)
        return best / per

    mc = frames_fn(2, 524_288)
    direct = frames_fn(1, 0)
    src0 = rbt.zero_sources(fields)
    t_mc = time_fn("mc_frame ", mc, fields, src0, jax.random.key(0),
                   per=FRAMES)
    t_dir = time_fn("direct   ", direct, fields, src0, jax.random.key(0),
                    per=FRAMES)
    src_real, _ = rbt.rbt_trace_frame(
        fields, rbt.zero_sources(fields), gb, scene.lights,
        scene.field_textures, brdf, jax.random.key(2), RAYS_PER_FRAME,
        jnp.int32(-1), max_bounces=1, mc_direct=True, analytic_direct=False,
        enable_brdf=False, light_kinds=(1,), hist_direct=True)
    t_cas = time_fn("cascade  ", cascade, fields, src_real)

    pps_mc = RAYS_PER_FRAME / t_mc
    for cadence in (1, 8):
        t = t_dir + t_cas / cadence
        print(f"dom cadence {cadence}: {t*1000:6.2f} ms/frame = "
              f"{RAYS_PER_FRAME/t/1e6:7.1f} M photons/s "
              f"(mc baseline {pps_mc/1e6:7.1f} M, "
              f"x{RAYS_PER_FRAME/t/pps_mc:5.2f})", flush=True)


if __name__ == "__main__":
    main()
