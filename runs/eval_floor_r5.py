"""k-floor sweep for the production composition (round 5).

With a raw-positive net, flooring the calibrated k credits common-mode
corrections the cross-projection is blind to (runs/eval_banded.py: +4.8
and +2.7 dB raw at k = 0 on held-out scenes 00008/00086). The danger is
converged scenes where a floored correction injects net error; the sweep
therefore also measures a NOISE-GATED floor: k_floor applies only when
the observable pair disagreement sigma_rel^2 = mean|a-b|^2 / mean(x^2)
exceeds a threshold — a converged pair (a ~ b) keeps the pure
calibration. Reports, per tier: gain at floor in {0, .25, .5, .75, 1}
ungated and gated, worst per-scene delta vs floor=0.

Usage: python runs/eval_floor_r5.py CKPT [--tiers RT0,RT1,1,0] [--train]
       [--gate G]   (--train evaluates TRAINING scenes - for choosing the
       shipped floor without touching held-out)
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np

import runs.quality_report as qr
from litbox_tpu.nn.infer import infer_large

FLOORS = (0.0, 0.25, 0.5, 0.75, 1.0)


def arg(flag, default, cast):
    return cast(sys.argv[sys.argv.index(flag) + 1]) if flag in sys.argv else default


def main():
    tiers = ["Input" + t for t in arg("--tiers", "RT0,RT1,1,0", str).split(",")]
    gate = arg("--gate", 1e-4, float)  # sigma_rel^2 threshold
    use_train = "--train" in sys.argv
    fn, rgb = qr.load_eval_fn()
    ids = (qr.train_ids[:8] if use_train else qr.held)
    which = "TRAIN" if use_train else "HELD-OUT"

    for tier in tiers:
        per = {("u", f): [] for f in FLOORS}
        per.update({("g", f): [] for f in FLOORS})
        scenes = []
        for i in ids:
            got = qr.load_pair(tier, i)
            if got is None:
                continue
            a, b, ref = got
            peak = max(float(ref.max()), 1e-6)
            out_a = infer_large(fn, a, rgb=rgb)
            out_b = infer_large(fn, b, rgb=rgb)
            x = (a + b) * 0.5
            dbar = ((out_a - a) + (out_b - b)) * 0.5
            num = float((((out_a - a) - (out_b - b)) * (b - a)).sum()) * 0.25
            den = max(float((dbar * dbar).sum()), 1e-12)
            k0 = float(np.clip(num / den, 0.0, 1.0))
            s2 = float(((a - b) ** 2).mean() / max(float((x * x).mean()), 1e-12))
            p0 = qr.psnr(x, ref, peak)
            scenes.append(i)
            for f in FLOORS:
                ku = max(k0, f)
                per[("u", f)].append(qr.psnr(x + ku * dbar, ref, peak) - p0)
                kg = max(k0, f) if s2 > gate else k0
                per[("g", f)].append(qr.psnr(x + kg * dbar, ref, peak) - p0)
            print(f"  {tier} {i}: k0={k0:.2f} s2={s2:.1e} "
                  + " ".join(f"u{f}:{per[('u', f)][-1]:+.2f}" for f in FLOORS),
                  flush=True)
        if not scenes:
            continue
        base0 = per[("u", 0.0)]
        print(f"{which} {tier} (n={len(scenes)}, gate s2>{gate:g}):")
        for mode, label in (("u", "ungated"), ("g", "gated  ")):
            for f in FLOORS:
                v = per[(mode, f)]
                worst = min(np.array(v) - np.array(base0))
                print(f"  {label} floor {f:4.2f}: mean {np.mean(v):+.3f} "
                      f"worst-delta {worst:+.2f}", flush=True)


if __name__ == "__main__":
    main()
