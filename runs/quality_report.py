"""QUALITY.md — the single, atomically-regenerated quality record.

Round 3 left a stale HELDOUT_EVAL.md contradicting the round narrative
(VERDICT r3 weak #2 / next #7). This script now produces EVERY quality
table in one run, so no table can be newer or older than another:

  1. GOLDEN   — the reference's own checkpoint_tests PNG pairs (PSNR+SSIM),
                raw net (k=1) and with the global fit_blend k; f32 and bf16.
  2. HELD-OUT — accumulated profiles (Input1/Input0) on never-trained
                scenes, PRODUCTION composition (pair mean + symmetric
                auto-blend, nn.infer.blend_pair_symmetric) vs the pair-mean
                baseline — the honest estimator comparison (ADVICE r3 #2:
                r3's tables blended around a single tracer, which is not
                what AIAccelerator ships).
  3. REALTIME — InputRT0/RT1 single-frame tiers, same production
                composition; the headline table (AIAccelerator.cs:57-84
                runs the model on every realtime step).

Usage: python runs/quality_report.py CKPT [--dataset DIR] [--out QUALITY.md]
       [--cpu] [--skip-golden] [--max-scenes N]
"""
from __future__ import annotations

import datetime
import glob
import hashlib
import os
import sys

sys.path.insert(0, "/root/repo")

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from litbox_tpu.io.images import read_image_linear
from litbox_tpu.nn.infer import (
    PRODUCTION_FLOOR_GATE,
    PRODUCTION_K_FLOOR,
    blend_pair_symmetric,
    blend_prior_lookup,
    fit_blend,
    fit_blend_prior,
    infer_large,
)
from litbox_tpu.nn.train import Trainer, load_train_config

_flag_vals = {sys.argv[sys.argv.index(f) + 1]
              for f in ("--dataset", "--out", "--max-scenes")
              if f in sys.argv}
CKPT = next(a for a in sys.argv[1:]
            if not a.startswith("--") and a not in _flag_vals)
DATASET = (sys.argv[sys.argv.index("--dataset") + 1] if "--dataset" in sys.argv
           else sorted(glob.glob("/root/repo/runs/dataset_r2/*"))[-1])
OUT = (sys.argv[sys.argv.index("--out") + 1] if "--out" in sys.argv
       else "/root/repo/QUALITY.md")
MAX_SCENES = (int(sys.argv[sys.argv.index("--max-scenes") + 1])
              if "--max-scenes" in sys.argv else 10**9)
GOLDENS = "/root/reference/checkpoint_tests"


def sha256(path: str, n: int = 12) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for blk in iter(lambda: f.read(1 << 20), b""):
            h.update(blk)
    return h.hexdigest()[:n]


def load_eval_fn(bf16: bool = False):
    trainer = Trainer(load_train_config(CKPT))
    trainer.load(CKPT)
    if bf16:
        import jax
        import jax.numpy as jnp

        cast = lambda t: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
        trainer.params = cast(trainer.params)
        trainer.batch_stats = cast(trainer.batch_stats)
        inner = trainer.eval_fn()
        return (lambda x: inner(jnp.asarray(x).astype(jnp.bfloat16))
                .astype(jnp.float32)), trainer.cfg.rgb
    return trainer.eval_fn(), trainer.cfg.rgb


def psnr(x, ref, peak):
    return 10 * np.log10(peak**2 / max(float(((x - ref) ** 2).mean()), 1e-12))


def ssim_np(a, b):
    import jax.numpy as jnp

    from litbox_tpu.nn.loss import ssim

    return float(ssim(jnp.asarray(a[None]), jnp.asarray(b[None])))


# ---------- datasets ----------
refs = sorted(glob.glob(os.path.join(DATASET, "Output_Reference_*.exr")))
ids = [p.split("_")[-1].split(".")[0] for p in refs]
held = [i for k, i in enumerate(ids) if k % 8 == 7][:MAX_SCENES]
train_ids = [i for k, i in enumerate(ids) if k % 8 != 7]

_scales: dict = {}


def scene_scale(i):
    if i not in _scales:
        r = read_image_linear(os.path.join(DATASET, f"Output_Reference_{i}.exr"))
        _scales[i] = 0.18 / max(float(r.mean()), 1e-6)
    return _scales[i]


def load_pair(prefix, i):
    pa = os.path.join(DATASET, f"{prefix}_Radiance_A_{i}.exr")
    pb = os.path.join(DATASET, f"{prefix}_Radiance_B_{i}.exr")
    if not (os.path.exists(pa) and os.path.exists(pb)):
        return None
    s = scene_scale(i)
    a = read_image_linear(pa) * s
    b = read_image_linear(pb) * s
    ref = read_image_linear(
        os.path.join(DATASET, f"Output_Reference_{i}.exr")) * s
    return (a.astype(np.float32), b.astype(np.float32),
            ref.astype(np.float32))


def fit_prior(fn, rgb, prefixes, n_scenes: int = 10):
    """Noise-indexed blend prior fit on TRAINING scenes across tiers
    (nn.infer.fit_blend_prior): recovers the common-mode credit the
    per-frame pair calibration is blind to."""
    def samples():
        for prefix in prefixes:
            for i in train_ids[:n_scenes]:
                got = load_pair(prefix, i)
                if got is None:
                    continue
                a, b, ref = got
                out_a = infer_large(fn, a, rgb=rgb)
                out_b = infer_large(fn, b, rgb=rgb)
                yield out_a, out_b, a, b, ref

    table = fit_blend_prior(samples())
    print("blend prior table:", table.tolist(), flush=True)
    return table


def production_rows(fn, rgb, prefixes, prior=None):
    """Per-tier production composition vs pair-mean baseline on held-out.

    Columns (round 5): `gain` = exact pair composition
    (blend_pair_symmetric, the calibration-frame display); `fast_gain` =
    the single-pass display x + k*(net(x)-x) with the SAME pair k (what
    the 60 FPS pipeline shows on non-calibration frames); `band_gain` =
    blend_pair_banded (spatially-banded k, measured r5 — kept as the
    honest no-better-than-global result unless it wins)."""
    from litbox_tpu.nn.infer import blend_pair_banded

    rows = []
    for prefix in prefixes:
        base, den, ks, raw_gain, fast_gain, band_gain = [], [], [], [], [], []
        nofloor_gain, prior_gain, prior_ks = [], [], []
        n = 0
        for i in held:
            got = load_pair(prefix, i)
            if got is None:
                continue
            a, b, ref = got
            peak = max(float(ref.max()), 1e-6)
            out_a = infer_large(fn, a, rgb=rgb)
            out_b = infer_large(fn, b, rgb=rgb)
            disp, k = blend_pair_symmetric(
                out_a, out_b, a, b, k_floor=PRODUCTION_K_FLOOR,
                floor_gate=PRODUCTION_FLOOR_GATE)
            disp_nofloor, k_nf = blend_pair_symmetric(out_a, out_b, a, b)
            x = (a + b) * 0.5
            base.append(psnr(x, ref, peak))
            den.append(psnr(disp, ref, peak))
            nofloor_gain.append(psnr(disp_nofloor, ref, peak) - base[-1])
            raw_gain.append(psnr((out_a + out_b) * 0.5, ref, peak) - base[-1])
            ks.append(float(k))
            out_x = infer_large(fn, x.astype(np.float32), rgb=rgb)
            fast_gain.append(
                psnr(x + float(k) * (out_x - x), ref, peak) - base[-1])
            disp_b, _ = blend_pair_banded(out_a, out_b, a, b)
            band_gain.append(psnr(np.asarray(disp_b), ref, peak) - base[-1])
            if prior is not None:
                kp = float(blend_prior_lookup(prior, a, b))
                k2 = max(float(k), kp)
                dbar = ((out_a - a) + (out_b - b)) * 0.5
                prior_gain.append(psnr(x + k2 * dbar, ref, peak) - base[-1])
                prior_ks.append(k2)
            n += 1
        if not n:
            continue
        rows.append(dict(
            tier=prefix, n=n, base=float(np.mean(base)),
            prod=float(np.mean(den)),
            gain=float(np.mean(den) - np.mean(base)),
            nofloor_gain=float(np.mean(nofloor_gain)),
            fast_gain=float(np.mean(fast_gain)),
            band_gain=float(np.mean(band_gain)),
            raw_gain=float(np.mean(raw_gain)), k=float(np.mean(ks)),
            prior_gain=(float(np.mean(prior_gain)) if prior_gain else None),
            prior_k=(float(np.mean(prior_ks)) if prior_ks else None)))
        print("tier", rows[-1], flush=True)
    return rows


def golden_pairs():
    out = []
    for k in range(10):
        a = f"{GOLDENS}/png_old/Input_{k}.png"
        b = f"{GOLDENS}/png_old/Output_{k}.png"
        if os.path.exists(a) and os.path.exists(b):
            out.append((f"old/{k}", a, b))
    for tier in ("easy", "mid", "hard"):
        for k in (2, 7):
            a = f"{GOLDENS}/png_{tier}/Input_{k}.png"
            b = f"{GOLDENS}/png_ref/Output_{k}.png"
            if os.path.exists(a) and os.path.exists(b):
                out.append((f"{tier}/{k}", a, b))
    return out


def golden_eval(fn, rgb, blend_k: float = 1.0, linearize: str = "ue5"):
    """8-bit-space golden metrics (the space the goldens exist in).

    linearize='ue5' (round 5, VERDICT r4 next #4): the goldens were written
    through the UE5 curve (white=2, black=-3, per-scene exposure) into an
    sRGB target (TextureExtensions.SaveTexturePNG:311-350), so the eval
    inverts THAT curve (post.tonemap.tonemap_ue5_inverse), gray-point
    scales (absorbing the unknown exposure), denoises in the HDR domain
    the net trained on, and re-applies curve + sRGB. 'gamma' keeps the
    round-4 plain-gamma decode for comparison."""
    from PIL import Image

    from litbox_tpu.post.tonemap import (GOLDEN_PNG_SHAPE, tonemap_ue5,
                                         tonemap_ue5_inverse)

    rows = []
    for name, ap, bp in golden_pairs():
        noisy = np.asarray(Image.open(ap).convert("RGB"), np.float32)
        ref = np.asarray(Image.open(bp).convert("RGB"), np.float32)
        y = (noisy / 255.0) ** 2.2
        if linearize == "ue5":
            hdr = np.asarray(tonemap_ue5_inverse(y))
            s = 0.18 / max(float(hdr.mean()), 1e-9)
            out = infer_large(fn, (hdr * s).astype(np.float32), rgb=rgb,
                              blend=blend_k) / s
            y_out = np.asarray(tonemap_ue5(np.clip(out, 1e-30, None),
                                           GOLDEN_PNG_SHAPE))
            den = np.clip(y_out ** (1 / 2.2) * 255.0, 0, 255)
        else:
            out = infer_large(fn, y.astype(np.float32), rgb=rgb,
                              blend=blend_k)
            den = np.clip(np.clip(out, 0, None) ** (1 / 2.2) * 255.0, 0, 255)
        rows.append(dict(
            pair=name,
            b_psnr=psnr(noisy, ref, 255.0), b_ssim=ssim_np(noisy / 255, ref / 255),
            d_psnr=psnr(den, ref, 255.0), d_ssim=ssim_np(den / 255, ref / 255)))
        print("golden", linearize, rows[-1], flush=True)
    return rows


def fit_global_blend(fn, rgb):
    """fit_blend on TRAINING scenes' realtime tier (the exported-model
    blend knob for pairless consumers like the golden eval)."""
    def pairs():
        for i in train_ids[:8]:
            pr = os.path.join(DATASET, f"InputRT0_Radiance_A_{i}.exr")
            pf = os.path.join(DATASET, f"Output_Reference_{i}.exr")
            if not os.path.exists(pr):
                continue
            s = scene_scale(i)
            yield read_image_linear(pr) * s, read_image_linear(pf) * s

    return fit_blend(fn, pairs(), rgb=rgb)


def main():
    fn, rgb = load_eval_fn()
    lines = []
    w = lines.append
    w("# QUALITY — litbox_tpu denoiser quality record")
    w("")
    w(f"Generated {datetime.datetime.utcnow().isoformat()}Z by "
      f"`runs/quality_report.py` (single atomic run — every table below is "
      f"from the same checkpoint and code state).")
    w("")
    w(f"- checkpoint: `{CKPT}` (sha256 `{sha256(CKPT)}`, "
      f"{os.path.getsize(CKPT) / 1e6:.0f} MB)")
    w(f"- dataset: `{os.path.basename(DATASET)}` — {len(ids)} scenes, "
      f"{len(held)} held-out (k % 8 == 7, never trained on)")
    w("- production inference = `AIAccelerator(blend='auto')`: denoise BOTH "
      "tracers, display pair mean + k*(d_a+d_b)/2 with k cross-calibrated "
      "per frame AND floored at the measured noise-gated production floor "
      "(round 5: k = max(k_est, 0.5) when the pair shows noise evidence "
      "sigma_rel^2 > 1e-4, else the pure estimate — "
      "`nn.infer.blend_pair_symmetric(k_floor=PRODUCTION_K_FLOOR, "
      "floor_gate=PRODUCTION_FLOOR_GATE)`; floor chosen on TRAINING "
      "scenes, runs/eval_floor_r5.py). Baselines are the "
      "pair MEAN (what the engine displays without the net) — a ~3 dB "
      "higher bar than the single-tracer baselines quoted before r4.")
    w("")

    # ---- realtime + held-out (production composition) ----
    # Diagnostic ONLY — the prior is measured here and NOT shipped (saved
    # away from the checkpoint so AIAccelerator.from_checkpoint never
    # auto-loads it): even with directional fill + evidence-mass gating
    # (nn.infer.fit_blend_prior), the reference-fit k transfers badly to
    # held-out scenes — one near-converged scene maps into a fitted k=1
    # noise bucket and loses ~70 dB, wiping out the tier mean. The shipped
    # composition is the pure per-frame pair calibration, which cannot be
    # fooled this way (k -> 0 exactly when the correction lacks
    # independent-noise evidence).
    prior = fit_prior(fn, rgb, ("InputRT0", "InputRT1", "Input1", "Input0"),
                      n_scenes=min(6, MAX_SCENES))
    np.save(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "blend_prior_diag.npy"), prior)

    def table(title, prefixes):
        w(f"## {title}")
        w("")
        w("| tier | n | pair-mean dB | production dB | gain | no-floor "
          "gain (r4 mode) | fast-display gain | banded gain | "
          "+prior gain (diagnostic) | raw-net gain | mean k |")
        w("|---|---|---|---|---|---|---|---|---|---|---|")
        rows = production_rows(fn, rgb, prefixes, prior=prior)
        for r in rows:
            w(f"| {r['tier']} | {r['n']} | {r['base']:.2f} | "
              f"{r['prod']:.2f} | **{r['gain']:+.2f}** | "
              f"{r['nofloor_gain']:+.2f} | "
              f"{r['fast_gain']:+.2f} | {r['band_gain']:+.2f} | "
              f"{r['prior_gain']:+.2f} | {r['raw_gain']:+.2f} | "
              f"{r['k']:.2f} |")
        w("")
        w("`production` = blend_pair_symmetric with the SHIPPED "
          "noise-gated k floor (nn.infer.PRODUCTION_K_FLOOR=0.5 behind "
          "PRODUCTION_FLOOR_GATE=1e-4, chosen on training scenes in "
          "runs/eval_floor_r5.py); `no-floor` = the r4 pure per-frame "
          "calibration; `fast-display` = the single-UNet-pass composition "
          "x + k*(net(x)-x) shown on non-calibration frames of the 60 FPS "
          "pipeline (same pair-calibrated k; runs/bench_1080p.py "
          "--pair-fast); `banded` = blend_pair_banded per-band k "
          "(runs/eval_banded.py established the oracle headroom is "
          "common-mode, not spatial).")
        w("")
        return rows

    rt = table("Realtime tiers (production regime, held-out scenes)",
               ("InputRT0", "InputRT1"))
    acc = table("Accumulated profiles (held-out scenes)",
                ("Input1", "Input0"))
    w("`+prior` = auto-k with the r4 noise-INDEXED floor fit on TRAINING "
      "scenes (`nn.infer.fit_blend_prior`) — still a DIAGNOSTIC column and "
      "still negative: it interpolates k across the noise axis, so "
      "near-converged scenes inherit k from noisy buckets. The shipped r5 "
      "floor differs in kind: a HARD gate that only ever DISABLES the "
      "floor (sigma_rel^2 <= 1e-4 -> pure calibration), never transfers "
      "k. The raw-net mean is dominated by ONE held-out scene whose pair "
      "is numerically converged (sigma_rel^2 ~ 2e-8, raw -76 dB — the "
      "gate excludes it by 4 orders of magnitude); the other 7 held-out "
      "scenes' raw gains are POSITIVE (+1.0 to +6.0 dB on RT0, "
      "runs/eval_floor_r5 logs in NOTES_ROUND5.md).")
    w("")

    # ---- goldens ----
    if "--skip-golden" not in sys.argv:
        w("## Reference goldens (checkpoint_tests, 8-bit PNG space)")
        w("")
        kg = fit_global_blend(fn, rgb)
        w(f"Round 5 evaluates in the goldens' TRUE domain: the PNGs were "
          f"written through the UE5 curve (white=2, black=-3, per-scene "
          f"exposure; TextureExtensions.SaveTexturePNG:311-350) into sRGB, "
          f"so the eval inverts that exact curve, denoises in linear HDR "
          f"(gray-point scaled), and re-applies it. The round-4 plain-gamma "
          f"column is kept to show the domain-mismatch cost. Raw net (k=1) "
          f"and blended (global k={kg:.2f} fit on training scenes — goldens "
          f"are single images, so the per-frame pair calibration does not "
          f"apply). EXR tiers are LFS stubs in this snapshot; PNG tiers are "
          f"real (BASELINE.md).")
        w("")
        rows_raw = golden_eval(fn, rgb, 1.0, linearize="ue5")
        rows_bl = (golden_eval(fn, rgb, kg, linearize="ue5")
                   if abs(kg - 1.0) > 1e-3 else rows_raw)
        rows_g = golden_eval(fn, rgb, 1.0, linearize="gamma")
        w("| pair | baseline dB / SSIM | raw net dB / SSIM | "
          "blended dB / SSIM | r4 gamma-domain raw dB / SSIM |")
        w("|---|---|---|---|---|")
        for rr, rb, rg in zip(rows_raw, rows_bl, rows_g):
            w(f"| {rr['pair']} | {rr['b_psnr']:.2f} / {rr['b_ssim']:.3f} | "
              f"{rr['d_psnr']:.2f} / {rr['d_ssim']:.3f} | "
              f"{rb['d_psnr']:.2f} / {rb['d_ssim']:.3f} | "
              f"{rg['d_psnr']:.2f} / {rg['d_ssim']:.3f} |")
        mean = lambda rows, k: float(np.mean([r[k] for r in rows]))
        w(f"| **mean** | {mean(rows_raw,'b_psnr'):.2f} / "
          f"{mean(rows_raw,'b_ssim'):.3f} | {mean(rows_raw,'d_psnr'):.2f} / "
          f"{mean(rows_raw,'d_ssim'):.3f} | {mean(rows_bl,'d_psnr'):.2f} / "
          f"{mean(rows_bl,'d_ssim'):.3f} | {mean(rows_g,'d_psnr'):.2f} / "
          f"{mean(rows_g,'d_ssim'):.3f} |")
        w("")

        # ---- bf16 spot check (production display precision) ----
        fn16, _ = load_eval_fn(bf16=True)
        rt16 = production_rows(fn16, rgb, ("InputRT0",))
        if rt16:
            r = rt16[0]
            w("## bf16 (fused-display precision) spot check")
            w("")
            w(f"InputRT0 production gain in bf16: **{r['gain']:+.2f} dB** "
              f"(k={r['k']:.2f}) vs f32 above — the fused 1080p pipeline "
              f"runs the net in bf16 (runs/bench_1080p.py --bf16).")
            w("")

    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", OUT)


if __name__ == "__main__":
    main()
