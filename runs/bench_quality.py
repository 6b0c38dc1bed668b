"""Quality-anchored perf metric: wall-clock time to convergence.

The reference's quality oracle is "run until relative temporal variance
xi < 1e-4" (Assets/Scenes/Training.unity:1148, machinery
ConvergenceMeasurement.cs:39-54). photons/s can be gamed by estimator
restructuring; time-to-xi on a fixed scene cannot — it prices the whole
frame loop (trace + accumulate + the resolves the convergence measurement
forces) in the units users feel. Reported alongside:

  * time-to-35dB: wall-clock until PSNR vs the engine's own converged
    output crosses 35 dB (a display-quality anchor).
  * the oracle engine (faithful per-texel march, sim/oracle.py) on the
    same scenes with the same thresholds, capped at --oracle-cap seconds.

Scenes are seed-fixed dataset-factory scenes (the reference's
TrainingManager regime) at 256x256, rays/frame and interval from the
Training.unity convergence profile (32768 @ ii=0.01, bounces 4).

Usage: python runs/bench_quality.py [--scenes 3] [--oracle-cap 600]
         [--report BENCH_QUALITY.md]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def arg(flag, default, cast=int):
    return cast(sys.argv[sys.argv.index(flag) + 1]) if flag in sys.argv else default


N_SCENES = arg("--scenes", 3)
ORACLE_CAP = arg("--oracle-cap", 600.0, float)
REPORT = arg("--report", None, str)
SIZE = 256
XI_THRESHOLD = 1e-4
PSNR_TARGET = 35.0


def make_scene(seed: int):
    from litbox_tpu.data.factory import (build_scene_from_description,
                                         generate_random_scene_description)

    rng = np.random.default_rng(seed)
    desc = generate_random_scene_description(rng)
    scene, exposure = build_scene_from_description(desc, SIZE, SIZE)
    return scene


def run_to_convergence(scene, engine: str, time_cap: float,
                       golden: np.ndarray | None = None,
                       measure_every: int = 20):
    """Run one sim to xi < 1e-4 (or the cap). Returns a result dict."""
    from litbox_tpu.engine import Mode, Simulation

    sim = Simulation(width=SIZE, height=SIZE, mode=Mode.REFERENCE,
                     rays_per_frame=32768, integration_interval=0.01,
                     photon_bounces=4, convergence_threshold=XI_THRESHOLD,
                     measurement_interval=measure_every, engine=engine, seed=7)
    sim.set_scene(scene)
    sim.step()  # first frame: compile + initial measurement
    # restart the clock after compilation so we price steady-state work
    out = np.asarray(sim.simulation_output_hdr)
    sim.invalidate()

    t0 = time.monotonic()
    t_psnr = None
    psnr_now = None
    while sim.is_running and time.monotonic() - t0 < time_cap:
        sim.step()
        if (golden is not None and t_psnr is None
                and sim.iterations_since_clear % measure_every == 0):
            out = np.asarray(sim.simulation_output_hdr)
            err = float(np.mean((out - golden) ** 2))
            peak = float(golden.max()) or 1.0
            psnr_now = 10 * np.log10(peak * peak / max(err, 1e-12))
            if psnr_now >= PSNR_TARGET:
                t_psnr = time.monotonic() - t0
    elapsed = time.monotonic() - t0
    return {
        "engine": engine,
        "frames": sim.iterations_since_clear,
        "elapsed_s": elapsed,
        "converged": sim.has_converged and sim.frame_limit == -1,
        "xi": sim.convergence_progress,
        "time_to_psnr": t_psnr,
        "psnr_at_end": psnr_now,
        "output": np.asarray(sim.simulation_output_hdr),
    }


def main():
    rows = []
    for i in range(N_SCENES):
        scene = make_scene(1000 + i)
        r_rbt = run_to_convergence(scene, "rbt", time_cap=1800.0)
        golden = r_rbt["output"]
        # Fresh run against the converged golden for the PSNR clock.
        r_rbt2 = run_to_convergence(scene, "rbt", time_cap=1800.0, golden=golden)
        r_ora = run_to_convergence(scene, "oracle", time_cap=ORACLE_CAP,
                                   golden=golden)
        rows.append((i, r_rbt, r_rbt2, r_ora))
        print(f"scene {i}: rbt {r_rbt['elapsed_s']:.1f}s/{r_rbt['frames']}fr "
              f"xi={r_rbt['xi']:.2e} conv={r_rbt['converged']}; "
              f"rbt 35dB at {r_rbt2['time_to_psnr']}s; "
              f"oracle {r_ora['elapsed_s']:.1f}s/{r_ora['frames']}fr "
              f"xi={r_ora['xi']:.2e} conv={r_ora['converged']} "
              f"psnr={r_ora['psnr_at_end']}", flush=True)

    lines = [
        "# BENCH_QUALITY — wall-clock time to reference quality",
        "",
        f"Scenes: {N_SCENES} seed-fixed factory scenes at {SIZE}x{SIZE}, "
        "convergence profile 32768 rays/frame @ ii=0.01, bounces 4 "
        "(Training.unity:1142-1148). xi = relative temporal variance of the "
        "dual-tracer pair; threshold 1e-4. time-to-35dB measured against the "
        "engine's own converged output. Oracle runs capped at "
        f"{ORACLE_CAP:.0f}s.",
        "",
        "| scene | engine | time-to-xi<1e-4 | frames | final xi | time-to-35dB |",
        "|---|---|---|---|---|---|",
    ]
    for i, r_rbt, r_rbt2, r_ora in rows:
        t_rbt = (f"{r_rbt['elapsed_s']:.1f} s" if r_rbt["converged"]
                 else f">{r_rbt['elapsed_s']:.0f} s (cap)")
        t_psnr = (f"{r_rbt2['time_to_psnr']:.1f} s"
                  if r_rbt2["time_to_psnr"] is not None else "—")
        lines.append(f"| {i} | rbt | {t_rbt} | {r_rbt['frames']} "
                     f"| {r_rbt['xi']:.2e} | {t_psnr} |")
        t_ora = (f"{r_ora['elapsed_s']:.1f} s" if r_ora["converged"]
                 else f">{r_ora['elapsed_s']:.0f} s (cap)")
        t_psnr_o = (f"{r_ora['time_to_psnr']:.1f} s"
                    if r_ora["time_to_psnr"] is not None
                    else (f"— ({r_ora['psnr_at_end']:.1f} dB at cap)"
                          if r_ora["psnr_at_end"] is not None else "—"))
        lines.append(f"| {i} | oracle | {t_ora} | {r_ora['frames']} "
                     f"| {r_ora['xi']:.2e} | {t_psnr_o} |")
    report = "\n".join(lines) + "\n"
    print(report)
    if REPORT:
        with open(REPORT, "w") as f:
            f.write(report)


if __name__ == "__main__":
    main()
