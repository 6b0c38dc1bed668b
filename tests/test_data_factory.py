import glob
import json
import os

import numpy as np
import pytest

from litbox_tpu.core.types import SimulationProfile
from litbox_tpu.data import (
    TrainingFactory,
    build_scene_from_description,
    generate_random_scene_description,
)
from litbox_tpu.data.substrate import generate_random, generate_texture, generate_random_params


def test_substrate_deterministic_from_seed():
    p1, tex1 = generate_random(1234, version=2, texture_size=64)
    p2, tex2 = generate_random(1234, version=2, texture_size=64)
    np.testing.assert_array_equal(np.asarray(tex1), np.asarray(tex2))
    t = np.asarray(tex1)
    assert t.shape == (64, 64, 4)
    assert t[..., 3].min() >= 0 and t[..., 3].max() <= 1.0 + 1e-5
    # Different seeds give different textures.
    _, tex3 = generate_random(99, version=2, texture_size=64)
    assert np.abs(np.asarray(tex3) - t).max() > 0.01


def test_substrate_edge_blur_softens():
    p = generate_random_params(7, texture_size=64)
    p.has_noise = False
    p.shapes = p.shapes[:1]
    p.shapes[0]["inverse"] = False
    p.sharpness = 0.0
    p.edge_blur = 1.0
    hard = np.asarray(generate_texture(p))[..., 3]
    p.edge_blur = 60.0
    soft = np.asarray(generate_texture(p))[..., 3]
    # Heavier blur lowers total alpha mass (more feathered edges).
    assert soft.sum() < hard.sum()


def test_scene_description_schema_roundtrip():
    rng = np.random.default_rng(0)
    desc = generate_random_scene_description(rng)
    blob = json.dumps(desc)
    back = json.loads(blob)
    assert 1 <= len(back["lights"]) <= 3
    assert all(l["type"] in ("Point", "Spot", "Laser", "Directional")
               for l in back["lights"])
    assert 1 <= len(back["substrateSeedsV2"]) <= 3
    assert -5 <= back["backgroundDensity"] <= -2
    scene, exposure = build_scene_from_description(back, 32, 32,
                                                   substrate_texture_size=32)
    assert np.isfinite(exposure)
    assert int(np.asarray(scene.lights.active).sum()) >= 1


@pytest.mark.slow
def test_factory_generates_and_resumes(tmp_path):
    tiny = (SimulationProfile(1, 512, 0.1, 2),)
    factory = TrainingFactory(
        output_folder=str(tmp_path), samples_to_generate=1, width=32, height=32,
        input_profiles=tiny,
        convergence_profile=SimulationProfile(-1, 512, 0.1, 2),
        convergence_threshold=10.0,  # converge immediately for the test
        max_convergence_frames=150, seed=5, substrate_texture_size=32)
    done = factory.generate()
    assert done == [0]
    files = sorted(os.path.basename(p) for p in glob.glob(factory.dataset_path + "/*"))
    assert "Scene_00000.json" in files
    assert "Input0_Radiance_A_00000.exr" in files
    assert "Input0_Radiance_B_00000.exr" in files
    assert "Output_Reference_00000.exr" in files
    assert "Output_Preview_00000.png" in files
    assert "Albedo_00000.png" in files
    assert "Transmissibility_00000.exr" in files

    # Resume: nothing to regenerate, completes instantly with same session.
    factory2 = TrainingFactory(
        output_folder=str(tmp_path), samples_to_generate=1, width=32, height=32,
        input_profiles=tiny,
        convergence_profile=SimulationProfile(-1, 512, 0.1, 2),
        convergence_threshold=10.0, continue_previous_session=True,
        max_convergence_frames=5, seed=6, substrate_texture_size=32)
    assert factory2.dataset_path == factory.dataset_path
    done2 = factory2.generate()
    assert done2 == [0]
