"""On-chip A/B: Pallas sorted-merge injection (ops/inject.py) vs the XLA
flat scatter (sim/rbt._inject_flat) at production update counts.

VERDICT round-1 weak #4: inject_sorted was built and interpret-tested but
never priced on hardware. This measures both at 256^2 (S=384) and
quarter-1080p (S=640) field shapes, 512K and 2M updates, full
materialization (.sum() of all three planes).

Usage: python runs/prof_inject.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np


def main():
    from litbox_tpu.ops.inject import inject_sorted
    from litbox_tpu.sim.rbt import _inject_flat

    rtt_probe = jax.jit(lambda x: jnp.sin(x))
    float(rtt_probe(jnp.float32(1.0)))
    rtt = min((lambda t0: (float(rtt_probe(jnp.float32(i))),
                           time.perf_counter() - t0)[1])(time.perf_counter())
              for i in range(3))
    print(f"rtt {rtt*1000:.1f} ms", flush=True)

    def timed(name, fn, *args, n=4):
        f = jax.jit(fn)
        float(f(*args))
        float(f(*args))
        best = 1e9
        for _ in range(n):
            t0 = time.perf_counter()
            float(f(*args))
            best = min(best, time.perf_counter() - t0 - rtt)
        print(f"{name}: {best*1000:8.2f} ms", flush=True)
        return best

    rng = np.random.default_rng(0)
    for s, d in ((384, 128), (640, 128)):
        planes = tuple(jnp.zeros((d, s, s)) for _ in range(3))
        total = d * s * s
        for nupd in (524_288, 2_097_152):
            idx = jnp.asarray(rng.integers(0, total, nupd, dtype=np.int32))
            en = jnp.asarray(rng.uniform(0, 1, (nupd, 3)).astype(np.float32))
            print(f"S={s} D={d} updates={nupd}", flush=True)
            tf = timed("  flat scatter ", lambda p, i, e:
                       sum(x.sum() for x in _inject_flat(p, i, e)),
                       planes, idx, en)
            ts = timed("  sorted merge ", lambda p, i, e:
                       sum(x.sum() for x in inject_sorted(p, i, e)),
                       planes, idx, en)
            print(f"  -> sorted/flat = {ts/tf:.2f}x", flush=True)

            # numerics: agreement on a small prefix
            a = jax.jit(_inject_flat)(planes, idx[:4096], en[:4096])
            b = jax.jit(inject_sorted)(planes, idx[:4096], en[:4096])
            for c in range(3):
                np.testing.assert_allclose(np.asarray(a[c]), np.asarray(b[c]),
                                           rtol=1e-5, atol=1e-6)
            print("  numerics OK", flush=True)


if __name__ == "__main__":
    main()
