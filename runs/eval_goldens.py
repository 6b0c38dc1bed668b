"""Golden-image quality anchor vs the reference's checkpoint_tests.

The reference wires checkpoint_tests as its only reproducible quality
goldens (train.bat:1,9; SURVEY.md section 4 item 1). The EXR tiers are
git-LFS stubs in this snapshot (133-byte pointers, documented in
BASELINE.md), but the PNG tiers are real:

  png_old:            Input_0..9.png <-> Output_0..9.png (full pairs)
  png_easy/mid/hard:  Input_2.png, Input_7.png  <-> png_ref/Output_2,7

Each pair is (tone-mapped noisy lightmap, tone-mapped converged
reference) from the reference engine itself. The eval reports PSNR/SSIM
of the noisy input against the reference (baseline) and, when a trained
checkpoint is given, of the denoised input (gain). Inference follows the
reference's evaluate() path: sRGB -> linear pow(2.2), per-channel mono
passes through the UNet in overlapping 256 tiles, re-encode, measure in
8-bit PNG space (the space the goldens exist in).

Usage: python runs/eval_goldens.py [checkpoint.npz] [--report GOLDEN_EVAL.md] [--bf16]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

GOLDENS = "/root/reference/checkpoint_tests"


def pairs() -> list[tuple[str, str, str]]:
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


def load8(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), dtype=np.float32)


def psnr8(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(((a - b) ** 2).mean())
    return 10 * np.log10(255.0**2 / max(mse, 1e-9))


def ssim8(a: np.ndarray, b: np.ndarray) -> float:
    import jax.numpy as jnp

    from litbox_tpu.nn.loss import ssim

    return float(ssim(jnp.asarray(a[None] / 255.0), jnp.asarray(b[None] / 255.0)))


def main():
    report = None
    args = sys.argv[1:]
    if "--report" in args:
        i = args.index("--report")
        report = args[i + 1]
        args = args[:i] + args[i + 2:]
    ckpt = next((a for a in args if not a.startswith("--")), None)

    use_bf16 = "--bf16" in args
    run_mono = None
    if ckpt:
        import jax
        import jax.numpy as jnp

        from litbox_tpu.nn.infer import infer_large
        from litbox_tpu.nn.train import Trainer, load_train_config

        trainer = Trainer(load_train_config(ckpt))
        trainer.load(ckpt)
        if use_bf16:
            # The production 1080p display path runs the net in bf16
            # (runs/bench_1080p.py --bf16); this measures what that costs in
            # quality (VERDICT r2 weak #2: unmeasured anywhere).
            cast = lambda t: jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
            trainer.params = cast(trainer.params)
            trainer.batch_stats = cast(trainer.batch_stats)
        inner_fn = trainer.eval_fn()
        if use_bf16:
            eval_fn = lambda x: inner_fn(
                jnp.asarray(x).astype(jnp.bfloat16)).astype(jnp.float32)
        else:
            eval_fn = inner_fn

        def denoise8(img8: np.ndarray) -> np.ndarray:
            lin = (img8 / 255.0) ** 2.2
            out = infer_large(eval_fn, lin.astype(np.float32), rgb=trainer.cfg.rgb)
            out = np.clip(out, 0.0, None) ** (1 / 2.2)
            return np.clip(out * 255.0, 0.0, 255.0)

        run_mono = denoise8

    rows = []
    for name, a_path, b_path in pairs():
        noisy = load8(a_path)
        ref = load8(b_path)
        base_psnr = psnr8(noisy, ref)
        base_ssim = ssim8(noisy, ref)
        row = {"pair": name, "baseline_psnr": base_psnr, "baseline_ssim": base_ssim}
        if run_mono is not None:
            den = run_mono(noisy)
            row["denoised_psnr"] = psnr8(den, ref)
            row["denoised_ssim"] = ssim8(den, ref)
            row["gain_db"] = row["denoised_psnr"] - base_psnr
        rows.append(row)
        print(" ".join(f"{k}={v:.3f}" if isinstance(v, float) else f"{k}={v}"
                       for k, v in row.items()), flush=True)

    mean = lambda k: float(np.mean([r[k] for r in rows if k in r]))
    summary = {"pairs": len(rows), "baseline_psnr": mean("baseline_psnr"),
               "baseline_ssim": mean("baseline_ssim")}
    if run_mono is not None:
        summary.update(denoised_psnr=mean("denoised_psnr"),
                       denoised_ssim=mean("denoised_ssim"),
                       mean_gain_db=mean("gain_db"))
    print("SUMMARY", summary)

    if report:
        with open(report, "w") as f:
            f.write("# Golden eval vs /root/reference/checkpoint_tests\n\n")
            f.write("PNG tiers only (EXR goldens are git-LFS stubs in the "
                    "snapshot). Metrics in 8-bit tone-mapped space.\n\n")
            if ckpt:
                f.write(f"Checkpoint: `{ckpt}`"
                        + (" (bf16 inference)" if use_bf16 else "") + "\n\n")
            cols = list(rows[0].keys())
            f.write("| " + " | ".join(cols) + " |\n")
            f.write("|" + "---|" * len(cols) + "\n")
            for r in rows:
                f.write("| " + " | ".join(
                    f"{r[c]:.3f}" if isinstance(r[c], float) else str(r[c])
                    for c in cols) + " |\n")
            f.write(f"\n**Summary:** {summary}\n")
        print("wrote", report)


if __name__ == "__main__":
    main()
