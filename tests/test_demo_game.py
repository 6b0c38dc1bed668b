"""Gameplay-layer tests (reference behaviors: Assets/Demo_Abduction/Scripts)."""
import math

import pytest

from litbox_tpu.demo.game import (
    AbductionGame,
    CameraController,
    GameInput,
    GameStateController,
    GameStates,
    Parallax,
    PlatformCycler,
    StarField,
    TractorBeam,
    UfoController,
    WaterAnimation,
)


def test_fsm_transitions_and_events():
    fsm = GameStateController()
    seen = []
    fsm.state_changed.append(lambda a, b: seen.append((a, b)))
    fsm.transition(GameStates.PLAYING)
    fsm.transition(GameStates.PAUSED)
    fsm.transition(GameStates.TITLE)
    assert seen == [(GameStates.TITLE, GameStates.PLAYING),
                    (GameStates.PLAYING, GameStates.PAUSED),
                    (GameStates.PAUSED, GameStates.TITLE)]
    with pytest.raises(ValueError):
        fsm.transition(GameStates.PAUSED)  # Title -> Paused is invalid


def test_ufo_reaches_intent_speed_and_tilts():
    ufo = UfoController()
    angles = []
    for i in range(2000):
        ufo.fixed_update(1.0, 0.0, 1 / 50)
        if i >= 1500:
            angles.append((ufo.angle + 180.0) % 360.0 - 180.0)
    assert abs(ufo.vx - ufo.max_speed) < 1e-3
    # steady state: quadratic return spring balances velocity tilt torque
    # (a^2 * return_force = max_tilt * max_speed -> |a| ~ 8.7 deg, nose
    # tilted against the motion like the reference)
    mean_a = sum(angles) / len(angles)
    assert -12.0 < mean_a < -4.0, mean_a
    # releasing input: drifts to stop and rights itself
    for _ in range(600):
        ufo.fixed_update(0.0, 0.0, 1 / 50)
    assert abs(ufo.vx) < 1e-3
    a = ufo.angle if ufo.angle <= 180 else ufo.angle - 360
    assert abs(a) < 2.0


def test_ufo_altitude_ceiling():
    ufo = UfoController()
    for _ in range(3000):
        ufo.fixed_update(0.0, 1.0, 1 / 50)
    assert ufo.y == pytest.approx(ufo.max_altitude)


def test_camera_roam_window():
    cam = CameraController()
    half_w = cam.ortho_size * cam.aspect
    # target inside the wiggle window: camera holds still
    cam.update(0.3 * half_w, cam.y + 0.05 * cam.ortho_size, 1 / 50)
    assert cam.x == 0.0
    # target far right: camera chases and keeps it inside the view
    for _ in range(800):
        cam.update(30.0, 0.0, 1 / 50)
    assert 30.0 - half_w < cam.x + half_w  # target on-screen
    assert cam.x > 0.0


def test_parallax_tracks_camera_fraction():
    p = Parallax(rate_x=0.6)
    p.late_update(0.0, 0.0)
    p.late_update(10.0, 0.0)
    assert p.x == pytest.approx(4.0)  # (1 - 0.6) of the camera delta


def test_platform_cycler_wraps():
    pc = PlatformCycler(width=20.0, child_xs=[-8.0, 0.0, 8.0])
    pc.update(cam_x=100.0)
    for x in pc.child_xs:
        assert 90.0 <= x <= 110.0


def test_starfield_deterministic_and_recycled():
    sf = StarField(star_density=16)
    sf.update(0, 0, 5, 1.0)
    first = {k: list(sf.stars[v]) for k, v in sf._blocks.items()}
    n_slots = sf._n_slots
    sf.update(500, 0, 5, 1.0)   # far away: all original blocks freed
    sf.update(0, 0, 5, 1.0)     # back: blocks reallocated from the pool
    assert sf._n_slots == n_slots  # recycling, no new instances
    for k, v in sf._blocks.items():
        assert sf.stars[v] == first[k]  # per-block seeding is deterministic


def test_tractor_beam_lifts_and_scores():
    ufo = UfoController(x=0.0, y=6.0)
    beam = TractorBeam()
    from litbox_tpu.demo.game import Abductee

    inside = Abductee(x=0.3, y=0.0)
    outside = Abductee(x=5.0, y=0.0)
    beam.active = True
    scored = 0
    for _ in range(200):
        scored += beam.update(ufo, [inside, outside], 1 / 25)
    assert inside.abducted and scored == 1
    assert not outside.captured and outside.y == 0.0
    # released mid-lift: target falls back to ground
    falling = Abductee(x=0.0, y=3.0)
    beam.active = False
    beam.update(ufo, [falling], 1.0)
    assert falling.y == pytest.approx(falling.ground_y)


def test_water_offsets_scroll():
    w = WaterAnimation(rate1=0.5, rate2=-0.25)
    for _ in range(10):
        w.update(0.1)
    assert w.offset1 == pytest.approx(0.5)
    assert w.offset2 == pytest.approx(-0.25)


def test_full_game_win():
    game = AbductionGame(n_targets=2, world_width=4.0)
    assert game.fsm.state == GameStates.TITLE
    game.step(0.02, GameInput(move_x=0.1))  # any input starts the game
    assert game.fsm.state == GameStates.PLAYING
    # descend over the targets and hold the beam
    for _ in range(2000):
        if game.won:
            break
        dx = 0.0
        pending = [t for t in game.targets if not t.abducted]
        if pending:
            dx = max(-1.0, min(1.0, pending[0].x - game.ufo.x))
        dy = max(-1.0, min(1.0, 6.0 - game.ufo.y))
        game.step(0.04, GameInput(move_x=dx, move_y=dy, tractor=True))
    assert game.won and game.score == 2
    p = game.scene_params()
    assert p["score"] == 2 and p["targets"] == []


def test_pause_toggles():
    game = AbductionGame()
    game.step(0.02, GameInput(move_x=1.0))
    game.step(0.02, GameInput(pause=True))
    assert game.fsm.state == GameStates.PAUSED
    x = game.ufo.x
    game.step(0.02, GameInput(move_x=1.0))  # ignored while paused
    assert game.ufo.x == x
    game.step(0.02, GameInput(pause=True))
    assert game.fsm.state == GameStates.PLAYING
