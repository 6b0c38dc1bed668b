"""Banded-k prototype evaluation (VERDICT r4 next #2).

Compares, on the held-out scenes of each tier, the compositions:

  global   — blend_pair_symmetric (the r4 production mode)
  banded   — blend_pair_banded (per-band self-calibrated k map)
  oracle-g — global k fit against the true reference (ceiling of global)
  oracle-b — per-band k fit against the true reference (ceiling of banded)

All PSNRs are vs the converged reference on the gray-point-normalized
scale of runs/quality_report.py. This is the measurement that decides
whether banded-k ships; QUALITY.md carries the production record.

Usage: python runs/eval_banded.py CKPT [--tiers RT0,RT1] [--max-scenes N]
       [--bands N] [--pool P] [--gate G]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

import runs.quality_report as qr
from litbox_tpu.nn.infer import (blend_pair_banded, blend_pair_symmetric,
                                 infer_large)


def arg(flag, default, cast):
    return cast(sys.argv[sys.argv.index(flag) + 1]) if flag in sys.argv else default


def oracle_global(out_a, out_b, a, b, ref):
    x = (a + b) * 0.5
    dbar = ((out_a - a) + (out_b - b)) * 0.5
    k = float(np.clip((dbar * (ref - x)).sum() / max((dbar * dbar).sum(), 1e-12),
                      0.0, 1.0))
    return x + k * dbar, k


def oracle_banded(out_a, out_b, a, b, ref, n_bands, pool):
    """Per-band k fit against the reference with the SAME soft banding as
    blend_pair_banded — the ceiling of what the banded estimator can get."""
    import jax
    import jax.numpy as jnp

    x = (a + b) * 0.5
    dbar = ((out_a - a) + (out_b - b)) * 0.5
    h, w = a.shape[:2]
    hp, wp = max(1, h // pool), max(1, w // pool)
    down_up = lambda z: np.asarray(jax.image.resize(
        jax.image.resize(jnp.asarray(z), (hp, wp), "linear"), (h, w), "linear"))
    s2 = down_up(((a - b) ** 2).mean(-1)) / np.maximum(
        down_up((x * x).mean(-1)), 1e-12)
    idx = np.clip((np.log10(np.maximum(s2, 1e-30)) * 0.5 + 6.0)
                  / 6.0 * (n_bands - 1), 0.0, n_bands - 1.0)
    i0 = np.floor(idx).astype(np.int32)
    t = idx - i0
    oh = np.zeros(idx.shape + (n_bands,), np.float32)
    np.put_along_axis(oh, i0[..., None], (1.0 - t)[..., None], axis=-1)
    i1 = np.minimum(i0 + 1, n_bands - 1)
    cur = np.take_along_axis(oh, i1[..., None], axis=-1)
    np.put_along_axis(oh, i1[..., None], cur + t[..., None], axis=-1)
    num_p = (dbar * (ref - x)).sum(-1)
    den_p = (dbar * dbar).sum(-1)
    n_b = (oh * num_p[..., None]).sum((0, 1))
    d_b = (oh * den_p[..., None]).sum((0, 1))
    k_b = np.clip(n_b / np.maximum(d_b, 1e-12), 0.0, 1.0)
    k_map = (oh * k_b).sum(-1)
    return x + k_map[..., None] * dbar, float(k_map.mean())


def main():
    tiers = ["Input" + t for t in
             arg("--tiers", "RT0,RT1,1,0", str).split(",")]
    max_scenes = arg("--max-scenes", 10**9, int)
    n_bands = arg("--bands", 6, int)
    pool = arg("--pool", 16, int)
    gate = arg("--gate", 0.01, float)

    fn, rgb = qr.load_eval_fn()
    for tier in tiers:
        rows = dict(base=[], glob=[], band=[], og=[], ob=[],
                    kg=[], kb=[], worst_band_minus_glob=[])
        per_scene = []
        for i in qr.held[:max_scenes]:
            got = qr.load_pair(tier, i)
            if got is None:
                continue
            a, b, ref = got
            peak = max(float(ref.max()), 1e-6)
            out_a = infer_large(fn, a, rgb=rgb)
            out_b = infer_large(fn, b, rgb=rgb)
            d_g, kg = blend_pair_symmetric(out_a, out_b, a, b)
            d_b_, kmap = blend_pair_banded(out_a, out_b, a, b,
                                           n_bands=n_bands, pool=pool,
                                           gate=gate)
            d_b_ = np.asarray(d_b_)
            d_og, _ = oracle_global(out_a, out_b, a, b, ref)
            d_ob, _ = oracle_banded(out_a, out_b, a, b, ref, n_bands, pool)
            x = (a + b) * 0.5
            p0 = qr.psnr(x, ref, peak)
            rows["base"].append(p0)
            rows["glob"].append(qr.psnr(d_g, ref, peak))
            rows["band"].append(qr.psnr(d_b_, ref, peak))
            rows["og"].append(qr.psnr(d_og, ref, peak))
            rows["ob"].append(qr.psnr(d_ob, ref, peak))
            rows["kg"].append(float(kg))
            rows["kb"].append(float(np.asarray(kmap).mean()))
            per_scene.append((i, rows["glob"][-1] - p0, rows["band"][-1] - p0))
            print(f"  {tier} {i}: base {p0:6.2f}  glob {rows['glob'][-1] - p0:+5.2f}"
                  f"  band {rows['band'][-1] - p0:+5.2f}"
                  f"  oracle-g {rows['og'][-1] - p0:+5.2f}"
                  f"  oracle-b {rows['ob'][-1] - p0:+5.2f}"
                  f"  kg {kg:.2f} kb {rows['kb'][-1]:.2f}", flush=True)
        if not rows["base"]:
            continue
        m = {k: float(np.mean(v)) for k, v in rows.items() if v}
        regress = [i for i, g, bb in per_scene if bb < g - 0.05]
        print(f"{tier}: n={len(rows['base'])} base {m['base']:.2f} | "
              f"glob {m['glob'] - m['base']:+.2f} | BAND {m['band'] - m['base']:+.2f} | "
              f"oracle-g {m['og'] - m['base']:+.2f} | oracle-b {m['ob'] - m['base']:+.2f} | "
              f"kg {m['kg']:.2f} kb {m['kb']:.2f} | "
              f"scenes where banded < global-0.05dB: {regress}", flush=True)


if __name__ == "__main__":
    main()
