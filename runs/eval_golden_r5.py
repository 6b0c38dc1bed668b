"""Golden-eval domain fix prototype (VERDICT r4 next #4).

The reference's golden PNGs are UE5-tonemapped (white=2, black=-3,
per-scene exposure; TextureExtensions.SaveTexturePNG:311-350) and
sRGB-encoded. Round 4 evaluated them by plain gamma decode — the net saw a
log-compressed domain it never trained on and gained ~nothing (+0.04 dB).

This script compares, on the same golden pairs and checkpoint:

  gamma — the round-4 path: lin = (png/255)^2.2, net, re-gamma.
  ue5   — the round-5 path: srgb-decode -> tonemap_ue5_inverse (the PNG
          writer's exact curve) -> per-image gray-point scale (absorbs
          the unknown per-scene exposure as 10^-e) -> net -> unscale ->
          tonemap_ue5 -> srgb-encode.

Metrics in 8-bit PNG space vs the stored reference, like QUALITY.md.

Usage: python runs/eval_golden_r5.py CKPT [--blend K] [--cpu]
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from litbox_tpu.nn.infer import infer_large
from litbox_tpu.nn.train import Trainer, load_train_config
from litbox_tpu.post.tonemap import (GOLDEN_PNG_SHAPE, tonemap_ue5,
                                     tonemap_ue5_inverse)

CKPT = next(a for a in sys.argv[1:] if not a.startswith("--")
            and not a.replace(".", "").isdigit())
BLEND = (float(sys.argv[sys.argv.index("--blend") + 1])
         if "--blend" in sys.argv else 1.0)
GOLDENS = "/root/reference/checkpoint_tests"


def golden_pairs():
    import os

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


def psnr(x, ref, peak=255.0):
    return 10 * np.log10(peak**2 / max(float(((x - ref) ** 2).mean()), 1e-12))


def ssim_np(a, b):
    import jax.numpy as jnp

    from litbox_tpu.nn.loss import ssim

    return float(ssim(jnp.asarray(a[None]), jnp.asarray(b[None])))


def main():
    from PIL import Image

    trainer = Trainer(load_train_config(CKPT))
    trainer.load(CKPT)
    fn = trainer.eval_fn()
    rgb = trainer.cfg.rgb

    rows = []
    for name, ap, bp in golden_pairs():
        noisy = np.asarray(Image.open(ap).convert("RGB"), np.float32)
        ref = np.asarray(Image.open(bp).convert("RGB"), np.float32)

        # --- round-4 gamma path ---
        lin_g = (noisy / 255.0) ** 2.2
        out_g = infer_large(fn, lin_g.astype(np.float32), rgb=rgb,
                            blend=BLEND)
        den_g = np.clip(np.clip(out_g, 0, None) ** (1 / 2.2) * 255.0, 0, 255)

        # --- round-5 UE5-inverse path ---
        y = (noisy / 255.0) ** 2.2                 # sRGB decode (ref approx)
        hdr = np.asarray(tonemap_ue5_inverse(y))   # writer-curve inverse
        s = 0.18 / max(float(hdr.mean()), 1e-9)    # gray point = training
        out = infer_large(fn, (hdr * s).astype(np.float32), rgb=rgb,
                          blend=BLEND) / s
        y_out = np.asarray(tonemap_ue5(np.clip(out, 1e-30, None),
                                       GOLDEN_PNG_SHAPE))
        den_u = np.clip(y_out ** (1 / 2.2) * 255.0, 0, 255)

        r = dict(pair=name,
                 b_psnr=psnr(noisy, ref), b_ssim=ssim_np(noisy / 255, ref / 255),
                 g_psnr=psnr(den_g, ref), g_ssim=ssim_np(den_g / 255, ref / 255),
                 u_psnr=psnr(den_u, ref), u_ssim=ssim_np(den_u / 255, ref / 255))
        rows.append(r)
        print(f"{name:8s} base {r['b_psnr']:6.2f}/{r['b_ssim']:.3f}  "
              f"gamma {r['g_psnr']:6.2f}/{r['g_ssim']:.3f}  "
              f"UE5 {r['u_psnr']:6.2f}/{r['u_ssim']:.3f}", flush=True)

    m = lambda k: float(np.mean([r[k] for r in rows]))
    print(f"\nMEAN    base {m('b_psnr'):6.2f}/{m('b_ssim'):.3f}  "
          f"gamma {m('g_psnr'):6.2f}/{m('g_ssim'):.3f}  "
          f"UE5 {m('u_psnr'):6.2f}/{m('u_ssim'):.3f}")


if __name__ == "__main__":
    main()
