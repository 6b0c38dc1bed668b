"""Play the Abduction demo end-to-end through the engine and emit a PNG strip.

VERDICT r2 next #9: the "playable game on top of the engine" proof the
reference's L11 (Assets/Demo_Abduction) represents. A greedy autopilot flies
the UFO to each abductee, beams it up, and wins; EVERY game step renders
through the full production pipeline (RBT trace -> resolve -> HDR ->
optional UNet denoise -> relit foreground composite -> Uchimura tonemap,
demo/abduction.py:render_frame). The committed artifact is one horizontal
strip of evenly spaced frames plus the final score line.

Usage: python runs/demo_strip.py [--denoise ckpt.npz] [--width N]
         [--steps N] [--out strip.png]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def arg(flag, default, cast=int):
    return cast(sys.argv[sys.argv.index(flag) + 1]) if flag in sys.argv else default


WIDTH = arg("--width", 128)
MAX_STEPS = arg("--steps", 300)
OUT = arg("--out", "/root/repo/runs/demo_strip.png", str)
CKPT = arg("--denoise", None, str)
RAYS = arg("--rays", 8192)
TILES = arg("--tiles", 12)
EXPOSURE = arg("--exposure", -0.45, float)


def autopilot(game):
    """Greedy player: hover toward the nearest remaining target, beam when
    roughly overhead (TractorBeam cone is 18 deg within 8 units)."""
    import math

    from litbox_tpu.demo.game import GameInput

    live = [t for t in game.targets if not t.abducted]
    if not live:
        return GameInput()
    t = min(live, key=lambda a: abs(a.x - game.ufo.x))
    dx = t.x - game.ufo.x
    dy_hover = 5.0 - game.ufo.y  # hold beam altitude ~5 (range 8)
    over = abs(math.atan2(dx, max(game.ufo.y - t.y, 1e-3))) < math.radians(14)
    return GameInput(move_x=float(np.clip(dx * 0.8, -1, 1)),
                     move_y=float(np.clip(dy_hover * 0.8, -1, 1)),
                     tractor=over)


def main():
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from litbox_tpu.demo.abduction import (_star_backdrop, build_game_scene,
                                           render_frame)
    from litbox_tpu.demo.game import AbductionGame
    from litbox_tpu.engine import Mode, Simulation
    from litbox_tpu.io.images import write_png

    denoise_fn = None
    if CKPT:
        from litbox_tpu.engine.pipeline import denoise_hdr
        from litbox_tpu.nn.train import Trainer, load_train_config

        trainer = Trainer(load_train_config(CKPT))
        trainer.load(CKPT)
        variables = {"params": trainer.params,
                     "batch_stats": trainer.batch_stats}
        denoise_fn = jax.jit(lambda hdr: denoise_hdr(
            trainer.model, variables, hdr, trainer.cfg.transform))
        print("denoising with", CKPT, flush=True)

    game = AbductionGame(n_targets=4, world_width=30.0)
    backdrop = _star_backdrop(WIDTH, WIDTH)
    sim = Simulation(width=WIDTH, height=WIDTH, mode=Mode.REFERENCE,
                     rays_per_frame=RAYS, measurement_interval=0)
    frames = []
    t0 = time.time()
    for i in range(MAX_STEPS):
        game.step(0.12, autopilot(game))
        sim.set_scene(build_game_scene(WIDTH, game.scene_params()))
        sim.frame_limit = 2
        sim.run(max_frames=2)
        hdr = sim.simulation_output_hdr
        if denoise_fn is not None:
            hdr = denoise_fn(hdr)
            sim._output_hdr = hdr  # render_frame reads the sim output
        frames.append(np.flipud(render_frame(sim, backdrop,
                                             exposure=EXPOSURE)))
        if i % 25 == 0:
            p = game.scene_params()
            print(f"{time.time()-t0:7.1f}s step {i} score {p['score']} "
                  f"won {p['won']}", flush=True)
        if game.won:
            print(f"WON at step {i}", flush=True)
            break

    p = game.scene_params()
    print(f"FINAL score {p['score']} won {p['won']} steps {len(frames)} "
          f"({time.time()-t0:.0f}s)", flush=True)

    idx = np.linspace(0, len(frames) - 1, min(TILES, len(frames))).astype(int)
    strip = np.concatenate([frames[k] for k in idx], axis=1)
    write_png(OUT, strip, srgb_encode=False)
    print("strip:", OUT, strip.shape, flush=True)


if __name__ == "__main__":
    main()
