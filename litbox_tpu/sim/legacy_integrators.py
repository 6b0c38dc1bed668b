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
