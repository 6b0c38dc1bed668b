"""Legacy integrator strategies (reference: Assets/Resources/LegacyIntegrators.cginc).

The reference keeps five alternative IMonteCarloMethod implementations as
design-space documentation — none are dispatched (SURVEY.md section 2.1).
They are preserved here the same way: as estimator descriptions plus a
reference implementation of the simplest one for A/B experiments.

  Implicit               (:8)   — march to the first interaction sampled by
                                  per-texel survival tests; deposit the full
                                  energy at the interaction point only
                                  (pure photon mapping, no in-scatter line
                                  deposits; high variance in thin media).
  ImplicitInterval       (:78)  — implicit walk + stratified interval
                                  deposits along the way (precursor of the
                                  production two-phase scheme).
  Explicit               (:161) — deposit E*(1-t) at EVERY texel crossed
                                  (zero-variance along the ray, heaviest
                                  write traffic; the RBT engine's dense scan
                                  is this estimator's exact integral form,
                                  which is why RBT needs no atomics).
  ExplicitBounded        (:224) — explicit deposits with a transmittance
                                  floor that terminates the walk early.
  ExplicitBounceImplicitInterval (:302) — explicit deposits between
                                  implicit-sampled bounces.

The production ForwardMonteCarlo (two-phase search/resolve with stratified
interval deposits) is in sim/oracle.py; RBT (sim/rbt.py) realizes the
Explicit estimator's expectation densely.

All five estimators are implemented below. `implicit_free_flight` is the
2D batched form; the other four are expressed on extracted 1D ray
profiles (per-texel transmissibility along a ray) — the natural TPU form,
since any 2D ray reduces to its profile row (exactly how the RBT engine
extracts rows from rotated fields), and the estimator math (distance
sampling, deposit weights, quantum scales) is what the reference file
documents. Each returns its per-texel deposit weights plus the sampled
bounce endpoint so tests can verify unbiasedness against closed forms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.sampling import sample_bilinear_uv


def implicit_free_flight(trans_field: jax.Array, origin: jax.Array,
                         direction: jax.Array, key: jax.Array,
                         max_steps: int = 512):
    """Reference implementation of the Implicit estimator's free flight
    (LegacyIntegrators.cginc:8-76): per-texel survival sampling.

    Returns (hit_position (N, 2), alive (N,)) where alive=False means the
    photon escaped without interacting. Batched, lock-step, for small-N
    experiments only.
    """
    n = origin.shape[0]
    size = jnp.array([trans_field.shape[1], trans_field.shape[0]], jnp.float32)

    def step(carry, k):
        pos, live, hit, hit_pos, key = carry
        key, kr = jax.random.split(key)
        uv = pos / size
        t = sample_bilinear_uv(trans_field, uv)
        u = jax.random.uniform(kr, (n,))
        interact = live & ~hit & (u > t)
        hit_pos = jnp.where(interact[:, None], pos, hit_pos)
        hit = hit | interact
        pos = jnp.where((live & ~hit)[:, None], pos + direction, pos)
        inside = ((pos >= -1.0) & (pos <= size + 1.0)).all(-1)
        live = live & inside
        return (pos, live, hit, hit_pos, key), None

    init = (origin, jnp.ones(n, bool), jnp.zeros(n, bool), origin, key)
    (pos, live, hit, hit_pos, _), _ = jax.lax.scan(step, init, jnp.arange(max_steps))
    return hit_pos, hit


# ---------------------------------------------------------------------------
# 1D ray-profile estimators. `ts` is the per-texel transmissibility along a
# ray, texel k covering u in [k, k+1); T(x) = prod_{k<x} ts[k] with fractional
# last texel. Helpers first.
# ---------------------------------------------------------------------------


def _cum_transmittance(ts: jax.Array) -> jax.Array:
    """T after crossing each texel: T[k] = prod_{j<=k} ts[j], shape (..., n)."""
    return jnp.cumprod(ts, axis=-1)


def _crossing_point(ts: jax.Array, target_t: jax.Array) -> jax.Array:
    """Fractional distance u where cumulative transmittance first drops
    below target_t (the log2 interpolation of EndTraversal,
    LegacyIntegrators.cginc:203: u = k + log(tp/T_before)/log(ts[k]))."""
    cum = _cum_transmittance(ts)
    n = ts.shape[-1]
    k = jnp.sum((cum > target_t[..., None]).astype(jnp.int32), axis=-1)
    k_c = jnp.clip(k, 0, n - 1)
    t_before = jnp.where(k_c > 0, jnp.take_along_axis(cum, jnp.maximum(k_c - 1, 0)[..., None], -1)[..., 0], 1.0)
    ts_k = jnp.take_along_axis(ts, k_c[..., None], -1)[..., 0]
    log_ts = jnp.log(jnp.clip(ts_k, 1e-30, 1.0 - 1e-7))
    frac = jnp.clip(jnp.log(jnp.maximum(target_t, 1e-30) / jnp.maximum(t_before, 1e-30)) / log_ts, 0.0, 1.0)
    return k_c.astype(jnp.float32) + frac


def implicit_endpoint(ts: jax.Array, key: jax.Array):
    """Implicit estimator (LegacyIntegrators.cginc:8-76).

    Samples the bounce endpoint UNIFORMLY along the ray (uTarget =
    rand*uEscape, :32) and weights by the transmittance up to it — the
    probability the photon reaches that far — times the local interaction
    density (1 - ts) (hitIntensity, :57). High variance in thin media:
    most uniform samples land where T(1-t) is tiny.

    Returns (u_target, weight): an unbiased one-sample estimator of the
    line integral  int_0^n T(u) sigma(u) du  when multiplied by n
    (the uniform-sampling 1/pdf factor; the reference folds its own
    constant rescale in at :56, here left to the caller).
    """
    n = ts.shape[-1]
    u = jax.random.uniform(key, ts.shape[:-1]) * n
    cum = _cum_transmittance(ts)
    k = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, n - 1)
    t_before = jnp.where(k > 0, jnp.take_along_axis(cum, jnp.maximum(k - 1, 0)[..., None], -1)[..., 0], 1.0)
    ts_k = jnp.take_along_axis(ts, k[..., None], -1)[..., 0]
    t_at = t_before * ts_k ** (u - k.astype(jnp.float32))
    weight = t_at * (1.0 - ts_k)
    return u, weight


def explicit_endpoint(ts: jax.Array, key: jax.Array):
    """Explicit estimator's distance sampling (LegacyIntegrators.cginc:161-222).

    Draws transmit potential tp = u^3 with quantum scale 3u^2 (:181-184):
    importance-samples deep (low-transmittance) endpoints, since
    tp = u^3 concentrates near 0. The pair (endpoint(tp), 3u^2) is an
    unbiased reweighting: for any f,
        E[3u^2 f(T^-1(u^3))] = int_0^1 f(T^-1(tp)) dtp
    i.e. the estimator integrates f over transmittance-uniform sampling.
    Photons whose tp falls below min transmittance escape (clamped here to
    the profile end, as the reference's escape test does via uEscape).

    Returns (u_hit, quantum_scale, t_at_hit).
    """
    u = jax.random.uniform(key, ts.shape[:-1])
    tp = u ** 3
    quantum = 3.0 * u ** 2
    u_hit = _crossing_point(ts, tp)
    return u_hit, quantum, tp


def explicit_bounded_endpoint(ts: jax.Array, key: jax.Array):
    """ExplicitBounded estimator (LegacyIntegrators.cginc:224-300): the
    production two-phase scheme's direct ancestor.

    Phase 1 (searching) marches to escape, measuring total escape
    transmittance T_esc. Phase 2 redraws tp ~ U[T_esc, 1] (:290) —
    CONDITIONING on interaction, with the interaction probability
    (1 - T_esc) folded into the energy (:293) — and flies to the
    crossing point. Zero wasted photons: every sample interacts.

    Returns (u_hit, energy_scale=(1 - T_esc), tp).
    """
    cum = _cum_transmittance(ts)
    t_esc = cum[..., -1]
    u = jax.random.uniform(key, ts.shape[:-1])
    tp = t_esc + u * (1.0 - t_esc)
    u_hit = _crossing_point(ts, tp)
    return u_hit, 1.0 - t_esc, tp


def implicit_interval_deposits(ts: jax.Array, key: jax.Array,
                               interval: float):
    """ImplicitInterval estimator's stratified in-scatter deposits
    (LegacyIntegrators.cginc:89-95,126-130).

    One deposit per stride of `interval` texels at jittered positions
    u_k = (k + xi) * interval, weighted by the transmittance up to u_k
    times the local interaction density — the stratified estimator of the
    in-scatter line integral whose exact form the RBT scan computes
    densely (sim/rbt.py attenuation_scan).

    Returns (u_samples (..., m), weights (..., m)) with m = ceil(n/interval).
    """
    n = ts.shape[-1]
    m = int(-(-n // interval))
    xi = jax.random.uniform(key, ts.shape[:-1] + (m,))
    u_s = (jnp.arange(m, dtype=jnp.float32) + xi) * interval
    cum = _cum_transmittance(ts)
    k = jnp.clip(jnp.floor(u_s).astype(jnp.int32), 0, n - 1)
    t_before = jnp.where(k > 0,
                         jnp.take_along_axis(cum, jnp.maximum(k - 1, 0), -1), 1.0)
    ts_k = jnp.take_along_axis(jnp.broadcast_to(ts, xi.shape[:-1] + (n,)), k, -1)
    t_at = t_before * ts_k ** (u_s - k.astype(jnp.float32))
    # Interval deposits integrate sigma over the stride: weight by
    # (1 - ts^interval)-style local density per the reference's
    # lod-corrected form (:93); for lod=0 texels this is (1 - ts_k),
    # scaled by the stride via the stratification itself.
    weights = t_at * (1.0 - ts_k) * jnp.where(u_s < n, 1.0, 0.0)
    return u_s, weights


def explicit_bounce_implicit_interval(ts: jax.Array, key: jax.Array,
                                      interval: float):
    """ExplicitBounceImplicitInterval (LegacyIntegrators.cginc:302-381):
    explicit (tp = u^3) bounce endpoint sampling combined with stratified
    interval deposits that SELF-ATTENUATE the photon energy as they are
    written (:319 — energy -= energy*albedo*outScatter), the only legacy
    estimator that removes deposited energy from the continuing photon.

    Returns (u_hit, quantum, u_samples, deposit_weights, energy_factor)
    where energy_factor is the multiplicative energy remaining after the
    self-attenuating deposits before u_hit (albedo taken as 1 here; the
    caller applies its own albedo track).
    """
    k_tp, k_dep = jax.random.split(key)
    u_hit, quantum, _ = explicit_endpoint(ts, k_tp)
    u_s, w = implicit_interval_deposits(ts, k_dep, interval)
    before = u_s < u_hit[..., None]
    w = w * before
    energy_factor = jnp.prod(jnp.where(before, 1.0 - w, 1.0), axis=-1)
    return u_hit, quantum, u_s, w, energy_factor
