"""Diagnose the golden-eval SSIM collapse (VERDICT r3 next #3).

Denoises two golden pairs with the r3 mono checkpoint on CPU, then maps
WHERE SSIM is lost: per-pixel SSIM-map stats split by reference luminance
(dark/mid/bright), plus output noise level in flat dark regions. Hypothesis
under test: the net emits low-amplitude texture in near-black flats; the
gamma decode (x^(1/2.2), infinite slope at 0) amplifies it to several 8-bit
levels, which floors the SSIM variance term everywhere the image is flat.
"""
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from PIL import Image

from litbox_tpu.nn.infer import infer_large
from litbox_tpu.nn.train import Trainer, load_train_config

CKPT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/runs/denoiser_r3/model_best.npz"
G = "/root/reference/checkpoint_tests"

trainer = Trainer(load_train_config(CKPT))
trainer.load(CKPT)
fn = trainer.eval_fn()


def ssim_map(a, b):
    from litbox_tpu.nn.loss import _conv_win, _gaussian_window

    w = _gaussian_window(11)
    a = jnp.asarray(a[None])
    b = jnp.asarray(b[None])
    mu_a, mu_b = _conv_win(a, w), _conv_win(b, w)
    s_a = jnp.maximum(_conv_win(a * a, w) - mu_a**2, 0.0)
    s_b = jnp.maximum(_conv_win(b * b, w) - mu_b**2, 0.0)
    s_ab = _conv_win(a * b, w) - mu_a * mu_b
    c1, c2 = 0.01**2, 0.03**2
    return np.asarray(((2 * mu_a * mu_b + c1) * (2 * s_ab + c2))
                      / ((mu_a**2 + mu_b**2 + c1) * (s_a + s_b + c2)))[0]


for name, a_path, b_path in [("old/1", f"{G}/png_old/Input_1.png", f"{G}/png_old/Output_1.png"),
                             ("old/7", f"{G}/png_old/Input_7.png", f"{G}/png_old/Output_7.png")]:
    noisy = np.asarray(Image.open(a_path).convert("RGB"), np.float32)
    ref = np.asarray(Image.open(b_path).convert("RGB"), np.float32)
    lin = (noisy / 255.0) ** 2.2
    out_lin = infer_large(fn, lin.astype(np.float32), rgb=trainer.cfg.rgb)
    den = np.clip(np.clip(out_lin, 0, None) ** (1 / 2.2) * 255.0, 0, 255)

    for label, img in (("noisy", noisy), ("denoised", den)):
        m = ssim_map(img / 255.0, ref / 255.0)
        refl = (ref / 255.0).mean(-1)
        dark, mid, bright = refl < 0.05, (refl >= 0.05) & (refl < 0.4), refl >= 0.4
        mm = m.mean(-1)
        print(f"{name} {label}: ssim mean={m.mean():.3f} "
              f"dark={mm[dark].mean() if dark.any() else float('nan'):.3f} (n={dark.sum()}) "
              f"mid={mm[mid].mean() if mid.any() else float('nan'):.3f} "
              f"bright={mm[bright].mean() if bright.any() else float('nan'):.3f}")
        # Noise level where the reference is flat black
        if dark.any():
            d8 = np.abs(img - ref).mean(-1)
            print(f"   dark-region |err| mean={d8[dark].mean():.2f}/255 "
                  f"p95={np.percentile(d8[dark], 95):.2f} "
                  f"out std in dark={img.mean(-1)[dark].std():.2f}")
    # where did SSIM go DOWN most
    m_n = ssim_map(noisy / 255.0, ref / 255.0).mean(-1)
    m_d = ssim_map(den / 255.0, ref / 255.0).mean(-1)
    drop = m_n - m_d
    refl = (ref / 255.0).mean(-1)
    for lo, hi in ((0, 0.02), (0.02, 0.1), (0.1, 0.3), (0.3, 1.1)):
        sel = (refl >= lo) & (refl < hi)
        if sel.any():
            print(f"   ref-lum [{lo},{hi}): n={sel.sum()} ssim drop={drop[sel].mean():+.3f}")
    print(flush=True)
