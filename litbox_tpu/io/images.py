"""PNG/EXR image helpers (reference: Util/TextureExtensions.cs:283-350,
litbox_dataset.py:60-65).

PNG writes optionally tone-map first, matching the reference's
`SaveTexturePNG(tonemap: true)`; PNG reads convert sRGB to linear with the
same `pow(2.2)` approximation as `litbox_dataset.load_srgb`.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

from .exr import read_exr_rgb, write_exr_rgb


def read_png_linear(path: str) -> np.ndarray:
    """(H, W, 3) float32 linear RGB; sRGB decoded with pow(2.2) like the reference."""
    img = np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0
    return img ** 2.2


def write_png(path: str, rgb: np.ndarray, srgb_encode: bool = True) -> None:
    rgb = np.asarray(rgb, dtype=np.float32)
    if srgb_encode:
        rgb = np.clip(rgb, 0.0, 1.0) ** (1.0 / 2.2)
    out = (np.clip(rgb, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(out).save(path)


def read_image_linear(path: str) -> np.ndarray:
    """Dispatch on extension like litbox_dataset.load_image.

    EXRs prefer the native multithreaded decoder (litbox_tpu.native) and
    fall back to the pure-Python codec.
    """
    if path.lower().endswith(".exr"):
        from ..native import read_exr_rgb_native

        out = read_exr_rgb_native(path)
        if out is not None:
            return out
        return read_exr_rgb(path)
    return read_png_linear(path)
