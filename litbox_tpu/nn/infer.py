"""Tiled large-image inference (reference: train_litbox_denoiser.py:283-315).

Processes RGB images channel-by-channel through the mono denoiser in
overlapping 256 tiles (overlap 1 << unet_size), averaging inner regions —
the reference's infer_large with its boundary-crop scheme. Also the
evaluate() golden runner (:317-360) writing EXR/PNG next to inputs.
"""

from __future__ import annotations

import glob
import os

import jax.numpy as jnp
import numpy as np

from ..io.exr import write_exr_rgb
from ..io.images import read_image_linear, write_png


def infer_large(run_mono, img: np.ndarray, tile: int = 256, overlap: int = 32) -> np.ndarray:
    """Denoise (H, W, C) channel-wise in overlapping tiles.

    run_mono: jitted fn mapping (1, tile, tile, 1) -> (1, tile, tile, 1).
    """
    h, w, c = img.shape
    stride = tile - overlap
    out = np.zeros_like(img, dtype=np.float32)
    counts = np.zeros((h, w, 1), dtype=np.float32)
    inner = overlap // 2

    ys = list(range(0, max(h - overlap, 1), stride))
    xs = list(range(0, max(w - overlap, 1), stride))
    # Ensure edge coverage even when the size isn't tile-aligned (the
    # reference skips partial tiles; we clamp the last tile instead so the
    # whole image is covered).
    if ys and ys[-1] + tile > h:
        ys[-1] = max(0, h - tile)
    if xs and xs[-1] + tile > w:
        xs[-1] = max(0, w - tile)

    for y in dict.fromkeys(ys):
        for x in dict.fromkeys(xs):
            if y + tile > h or x + tile > w:
                continue
            block = img[y:y + tile, x:x + tile]
            channels = []
            for ci in range(c):
                t = jnp.asarray(block[None, :, :, ci:ci + 1])
                channels.append(np.asarray(run_mono(t))[0, :, :, 0])
            tile_out = np.stack(channels, -1)
            out[y + inner:y + tile - inner, x + inner:x + tile - inner] += (
                tile_out[inner:tile - inner, inner:tile - inner])
            counts[y + inner:y + tile - inner, x + inner:x + tile - inner] += 1

    return out / np.maximum(counts, 1.0)


def evaluate(run_mono, input_pattern: str, output_folder: str,
             tile: int = 256, overlap: int = 32) -> list[str]:
    """Denoise every file matching the pattern; write *_eval.{exr,png}."""
    os.makedirs(output_folder, exist_ok=True)
    written = []
    for path in sorted(glob.glob(input_pattern)):
        img = read_image_linear(path)
        out = infer_large(run_mono, img, tile, overlap)
        stem, ext = os.path.basename(path).rsplit(".", 1)
        out_path = os.path.join(output_folder, f"{stem}_eval.{ext}")
        if ext.lower() == "exr":
            write_exr_rgb(out_path, out)
        else:
            write_png(out_path, np.clip(out, 0, 1))
        written.append(out_path)
    return written
