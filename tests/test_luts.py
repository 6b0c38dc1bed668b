import numpy as np

from litbox_tpu.core import luts


def test_invert_cdf_uniform_is_identity():
    domain = np.linspace(0.0, 1.0, 512)
    inv = luts.invert_cdf(np.ones(512), domain)
    np.testing.assert_allclose(inv, domain, atol=2e-3)


def test_invert_cdf_matches_analytic():
    # pdf(x) = 2x on [0,1] -> cdf = x^2 -> inverse = sqrt(u)
    domain = np.linspace(0.0, 1.0, 4096)
    inv = luts.invert_cdf(domain * 2.0, domain)
    # The table's own CDF endpoints aren't exactly (0,1); compare mid-range.
    u = np.linspace(0.0, 1.0, 4096)
    np.testing.assert_allclose(inv[100:-100], np.sqrt(u)[100:-100], atol=5e-3)


def test_mie_lut_distribution():
    table = luts.mie_scattering_lut()
    assert table.shape == (luts.LUT_SIZE, 3)
    # Unit direction vectors.
    norms = np.hypot(table[:, 0], table[:, 1])
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # Sampling uniformly must reproduce the pdf: histogram of angles.
    u = np.random.default_rng(0).uniform(size=200_000)
    idx = np.clip((u * (luts.LUT_SIZE - 1)).astype(int), 0, luts.LUT_SIZE - 1)
    theta = np.arctan2(table[idx, 1], table[idx, 0])
    hist, edges = np.histogram(theta, bins=64, range=(-np.pi, np.pi), density=True)
    centers = (edges[:-1] + edges[1:]) / 2
    pdf = (0.5 + np.cos(centers) ** 2) / (1 + 0.3 * np.cos(centers))
    pdf = pdf / np.trapezoid(pdf, centers)
    assert np.abs(hist - pdf).max() < 0.05


def test_teardrop_weight_is_inverse_density():
    table = luts.teardrop_scattering_lut(3.0)
    theta = np.arctan2(table[:, 1], table[:, 0])
    pdf = 1 + 3.0 * (theta / np.pi) ** 6
    avg = np.mean(1 + 3.0 * (np.linspace(-np.pi, np.pi, luts.LUT_SIZE) / np.pi) ** 6)
    np.testing.assert_allclose(table[:, 2], avg / pdf, rtol=2e-2)


def test_brdf_lut_structure():
    table = luts.brdf_lut((32, 9, 4))
    assert table.shape == (32, 9, 4, 4)
    norms = np.hypot(table[..., 0], table[..., 1])
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    # Weight channel: 0 at table ends, 1 inside.
    assert np.all(table[0, ..., 3] == 0) and np.all(table[-1, ..., 3] == 0)
    assert np.all(table[1:-1, ..., 3] == 1)
    # Roughness 0 interior snaps to the mirror direction.
    j = 5
    incident = np.arcsin(2 * j / 8 - 1)
    np.testing.assert_allclose(table[1:-1, j, 0, 0], np.cos(-incident), atol=1e-5)
    np.testing.assert_allclose(table[1:-1, j, 0, 1], np.sin(-incident), atol=1e-5)


def test_lut_sampling_matches_numpy():
    import jax.numpy as jnp

    from litbox_tpu.core.sampling import sample_lut, sample_lut_mxu

    table = jnp.asarray(luts.mie_scattering_lut(64))
    u = jnp.linspace(0, 1, 97)
    a = sample_lut(table, u)
    b = sample_lut_mxu(table, u)
    # bf16-matmul tolerance: on TPU the one-hot path uses the MXU default
    # precision, which is plenty for scattering directions.
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-2)
