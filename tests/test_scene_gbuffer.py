import numpy as np

from litbox_tpu.scene import SceneBuilder, build_pyramid, rasterize


def _simple_scene():
    b = SceneBuilder()
    b.add_point_light((32, 32), radius=4.0, color=(1, 0.8, 0.6), intensity=2.0)
    b.add_rect((40, 40), (10, 6), rotation=0.0, color=(1, 0, 0, 1), log_density=-1.0)
    b.add_ellipse((16, 48), (8, 8), color=(0, 1, 0, 1), log_density=-0.5, alignment=0.7)
    return b.build(max_lights=4, max_shapes=8)


def test_rasterize_coverage_and_blending():
    scene = _simple_scene()
    gb = rasterize(scene, 64, 64)
    albedo = np.asarray(gb.albedo)
    trans = np.asarray(gb.transmissibility)
    normal = np.asarray(gb.normal)

    # Background cleared correctly.
    assert albedo[0, 0, 0] == 0 and albedo[0, 0, 3] == 1.0
    assert trans[0, 0] == 1.0
    assert np.all(normal[0, 0] == 0)

    # Inside the rect: red albedo, attenuated transmissibility.
    assert albedo[40, 40, 0] > 0.5 and albedo[40, 40, 1] == 0.0
    expected_t = (1 - 10 ** -1.0) ** (100 / 64)
    np.testing.assert_allclose(trans[40, 40], expected_t, rtol=1e-5)

    # Rect normals: unit 2D outward edge normals per quadrant.
    n = normal[40, 49, :2]  # near right edge -> +x quadrant
    np.testing.assert_allclose(n, [1.0, 0.0], atol=1e-5)
    n = normal[44, 40, :2]  # near top edge -> +y quadrant
    np.testing.assert_allclose(n, [0.0, 1.0], atol=1e-5)

    # Ellipse: interior normal magnitude ramps with radius; alignment stored.
    c = normal[48, 16]
    assert np.hypot(c[0], c[1]) < 0.2  # near center
    rim = normal[48, 16 + 7]
    assert np.hypot(rim[0], rim[1]) > 0.7
    assert abs(rim[3] - 0.7) < 1e-6


def test_rasterize_energy_of_light_unused_by_gbuffer():
    scene = _simple_scene()
    gb = rasterize(scene, 32, 32)
    assert gb.albedo.shape == (32, 32, 4)


def test_rotated_rect_coverage():
    b = SceneBuilder()
    b.add_rect((32, 32), (16, 4), rotation=np.pi / 4, color=(1, 1, 1, 1), log_density=0.0)
    gb = rasterize(b.build(max_lights=1, max_shapes=2), 64, 64)
    trans = np.asarray(gb.transmissibility)
    assert trans[32, 32] < 1e-6  # density 1 -> opaque at center
    # Along the rotated long axis.
    assert trans[40, 40] < 1e-6
    # Perpendicular offset outside the thin rect.
    assert trans[22, 42] == 1.0


def test_pyramid_levels_and_quadtree():
    scene = _simple_scene()
    gb = rasterize(scene, 64, 64)
    pyr = build_pyramid(gb)
    assert pyr.levels[0].shape == (64, 64, 4)
    assert pyr.levels[1].shape == (32, 32, 4)
    # Minimum channel is a lower bound of the average channel everywhere.
    for lvl in pyr.levels[1:]:
        lv = np.asarray(lvl)
        assert np.all(lv[..., 1] <= lv[..., 0] + 1e-5)
    q = np.asarray(pyr.quadtree)
    assert q.shape == (64, 64)
    # Flat background regions resolve to coarse leaves.
    assert q[0, 0] > 0
