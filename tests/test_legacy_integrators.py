"""Unbiasedness checks for the five legacy estimator strategies
(reference: Assets/Resources/LegacyIntegrators.cginc — design-space dead
code there; executable design-space documentation here)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from litbox_tpu.sim.legacy_integrators import (
    explicit_bounce_implicit_interval,
    explicit_bounded_endpoint,
    explicit_endpoint,
    implicit_endpoint,
    implicit_interval_deposits,
)

N = 64          # profile length (texels)
T_UNIFORM = 0.97
BATCH = 200_000


def _uniform_profile(batch=BATCH, t=T_UNIFORM, n=N):
    return jnp.full((batch, n), t, jnp.float32)


def _line_integral(t=T_UNIFORM, n=N):
    """int_0^n T(u) sigma(u) du for a uniform medium, T(u)=t^u, sigma=1-t."""
    return (1.0 - t) * (1.0 - t**n) / (-np.log(t))


def test_implicit_endpoint_unbiased():
    u, w = implicit_endpoint(_uniform_profile(), jax.random.key(0))
    est = float(jnp.mean(w)) * N  # 1/pdf = n for uniform sampling
    assert abs(est / _line_integral() - 1.0) < 0.02, est


def test_explicit_endpoint_reweighting():
    """E[quantum * f(u_hit)] = int_0^1 f(T^-1(tp)) dtp (tp = u^3 with
    3u^2 quantum scale is a change of variables to uniform tp)."""
    ts = _uniform_profile()
    u_hit, quantum, _ = explicit_endpoint(ts, jax.random.key(1))
    est = float(jnp.mean(quantum * u_hit))
    # closed form: u(tp) = min(ln tp / ln t, n)
    tp = np.linspace(1e-6, 1.0, 200_001)
    expect = np.trapezoid(np.minimum(np.log(tp) / np.log(T_UNIFORM), N), tp)
    assert abs(est / expect - 1.0) < 0.02, (est, expect)


def test_explicit_bounded_endpoint_distribution():
    """tp ~ U[T_esc, 1] conditions on interaction: CDF of the endpoint is
    (1 - T(x)) / (1 - T_esc) and the energy scale is exactly 1 - T_esc."""
    ts = _uniform_profile()
    u_hit, scale, _ = explicit_bounded_endpoint(ts, jax.random.key(2))
    t_esc = T_UNIFORM**N
    np.testing.assert_allclose(np.asarray(scale), 1.0 - t_esc, rtol=1e-5)
    xs = np.linspace(0.0, N, 101)
    expect_mean = np.trapezoid(
        (T_UNIFORM**xs - t_esc) / (1.0 - t_esc), xs)  # int (1 - CDF)
    est = float(jnp.mean(u_hit))
    assert abs(est / expect_mean - 1.0) < 0.02, (est, expect_mean)
    assert float(u_hit.max()) <= N


def test_implicit_interval_deposits_stratified():
    """interval * sum(weights) is the stratified estimator of the
    in-scatter line integral (each stratum covers `interval` texels)."""
    interval = 8
    ts = _uniform_profile(batch=50_000)
    u_s, w = implicit_interval_deposits(ts, jax.random.key(3), interval)
    assert u_s.shape[-1] == N // interval
    est = float(jnp.mean(jnp.sum(w, -1))) * interval
    assert abs(est / _line_integral() - 1.0) < 0.03, est


def test_explicit_bounce_implicit_interval_consistency():
    ts = _uniform_profile(batch=10_000)
    u_hit, quantum, u_s, w, efac = explicit_bounce_implicit_interval(
        ts, jax.random.key(4), 8)
    # deposits strictly before the bounce endpoint
    assert bool(jnp.all((w == 0.0) | (u_s < u_hit[:, None])))
    # self-attenuation keeps remaining energy in (0, 1]
    assert float(efac.min()) > 0.0 and float(efac.max()) <= 1.0
    # attenuation only where deposits happened
    some = jnp.sum(w, -1) > 0
    assert bool(jnp.all(jnp.where(some, efac < 1.0, efac == 1.0)))


def test_nonuniform_profile_crossing_exact():
    """Crossing inversion is exact on a two-segment profile."""
    ts = jnp.concatenate([jnp.full((1, 16), 0.99), jnp.full((1, 16), 0.8)], -1)
    t_esc = 0.99**16 * 0.8**16
    u_hit, scale, tp = explicit_bounded_endpoint(ts, jax.random.key(5))
    # reconstruct transmittance at the sampled endpoint and compare to tp
    u = float(u_hit[0])
    t_at = 0.99 ** min(u, 16.0) * (0.8 ** max(u - 16.0, 0.0))
    np.testing.assert_allclose(t_at, float(tp[0]), rtol=1e-4)
