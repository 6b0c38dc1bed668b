import jax
import jax.numpy as jnp
import numpy as np

from litbox_tpu.post.tracer_post import importance_pyramid
from litbox_tpu.sim.materials import scatter_importance_guided


def test_guided_sampler_concentrates_on_bright_region():
    w = 64
    radiance = np.zeros((w, w, 3), np.float32)
    radiance[8:16, 40:56] = 4.0   # one bright blob
    radiance[40:56, 8:16] = 1.0   # a dimmer blob
    ra = jnp.asarray(radiance)
    pyr = importance_pyramid(ra, ra)

    n = 8192
    key = jax.random.key(0)
    origin = jnp.tile(jnp.array([[0.5, 0.5]]), (n, 1))
    offsets, weight = scatter_importance_guided(pyr, origin, jax.random.uniform(key, (n, 2)))
    pts = np.asarray(origin + offsets)
    wts = np.asarray(weight)

    assert np.all(np.isfinite(pts)) and np.all(np.isfinite(wts))
    # Samples concentrate in the two blobs with ~4:1 preference.
    # Pyramid level 0 is half-res of the radiance; uv maps the full frame.
    in_bright = ((pts[:, 0] > 40 / 64) & (pts[:, 0] < 56 / 64)
                 & (pts[:, 1] > 8 / 64) & (pts[:, 1] < 16 / 64))
    in_dim = ((pts[:, 0] > 8 / 64) & (pts[:, 0] < 16 / 64)
              & (pts[:, 1] > 40 / 64) & (pts[:, 1] < 56 / 64))
    frac_covered = in_bright.mean() + in_dim.mean()
    assert frac_covered > 0.7, frac_covered
    ratio = in_bright.mean() / max(in_dim.mean(), 1e-9)
    assert 2.0 < ratio < 8.0, ratio

    # Importance weights are inverse densities: weighting undoes the
    # importance distribution, so the two equal-AREA blobs (the sampler's
    # entire support) carry equal weighted mass despite the 4:1 energies.
    weighted_frac = wts[in_bright].sum() / (wts[in_bright].sum() + wts[in_dim].sum())
    assert abs(weighted_frac - 0.5) < 0.05, weighted_frac
