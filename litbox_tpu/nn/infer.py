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


def infer_large(run_mono, img: np.ndarray, tile: int = 256, overlap: int = 32,
                batch: int = 8, rgb: bool = False,
                blend: float = 1.0) -> np.ndarray:
    """Denoise (H, W, C) channel-wise in overlapping tiles.

    run_mono: jitted fn mapping (N, tile, tile, 1) -> (N, tile, tile, 1).
    Tiles x channels are dispatched in device batches of `batch`: through
    the ~35 ms-RTT TPU tunnel, the reference's one-call-per-tile-per-channel
    loop (train_litbox_denoiser.py:283-315) costs hours on a 2K golden set;
    batching cuts round-trips ~batch*C-fold with identical results.
    """
    h, w, c = img.shape
    if h < tile or w < tile:
        if min(h, w) < 2:
            raise ValueError(f"input too small to denoise: {img.shape}")
        # Sub-tile input: reflect-pad up to one tile, denoise, crop back.
        # (Without this the y + tile <= h filter drops every tile and the
        # counts-normalized output would be silently all zero.)
        padded = img
        while padded.shape[0] < tile or padded.shape[1] < tile:
            py = min(tile - padded.shape[0], padded.shape[0] - 1)
            px = min(tile - padded.shape[1], padded.shape[1] - 1)
            padded = np.pad(padded, ((0, max(py, 0)), (0, max(px, 0)), (0, 0)),
                            mode="reflect")
        return infer_large(run_mono, padded, tile, overlap, batch,
                           rgb=rgb, blend=blend)[:h, :w]
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

    # rgb=True: run_mono takes (N, tile, tile, 3) tiles in one pass (the
    # RGB realtime variant, unet.LitboxDenoiserNet.out_channels=3); the
    # default runs each channel as its own work item (reference parity).
    chans = [None] if rgb else list(range(c))
    work = [(y, x, ci) for y in dict.fromkeys(ys) for x in dict.fromkeys(xs)
            if y + tile <= h and x + tile <= w for ci in chans]

    for s in range(0, len(work), batch):
        group = work[s:s + batch]
        blocks = np.stack([img[y:y + tile, x:x + tile]
                           if ci is None else img[y:y + tile, x:x + tile,
                                                  ci:ci + 1]
                           for y, x, ci in group])
        # Pad the last group to the compiled batch size (avoids a recompile).
        pad = batch - len(group)
        if pad:
            blocks = np.concatenate([blocks, np.zeros((pad,) + blocks.shape[1:],
                                                      blocks.dtype)])
        res = np.asarray(run_mono(jnp.asarray(blocks)))[:len(group)]
        for (y, x, ci), r in zip(group, res):
            sl = slice(None) if ci is None else ci
            # Inner-crop each tile EXCEPT on sides touching the image
            # boundary: a boundary tile must keep its edge rows/cols or the
            # image rim is never written (a 256^2 single-tile input would
            # get a 16 px zero ring = 23% of its pixels — this depressed
            # every 256^2 held-out metric in round 2).
            iy0 = inner if y > 0 else 0
            iy1 = inner if y + tile < h else 0
            ix0 = inner if x > 0 else 0
            ix1 = inner if x + tile < w else 0
            out[y + iy0:y + tile - iy1, x + ix0:x + tile - ix1, sl] += (
                r[iy0:tile - iy1, ix0:tile - ix1,
                  slice(None) if ci is None else 0])
            if ci is None or ci == 0:
                counts[y + iy0:y + tile - iy1, x + ix0:x + tile - ix1] += 1

    out = out / np.maximum(counts, 1.0)
    if blend != 1.0:
        # Residual-blend shrinkage: out = x + k (net(x) - x). See fit_blend.
        out = img + np.float32(blend) * (out - img)
    return out


def fit_blend(run_mono, pairs, rgb: bool = False, tile: int = 256,
              overlap: int = 32, batch: int = 8) -> float:
    """Closed-form calibration of the residual-blend factor k.

    Production denoisers expose a blend factor between the raw and denoised
    images (the reference's Unity.InferenceEngine path would sit behind the
    same kind of knob; OptiX/OIDN call it `blendFactor`). For
    out_k = x + k (net(x) - x), the MSE-optimal scalar over a calibration
    set {(x_i, ref_i)} is the least-squares projection

        k* = sum <net(x)-x, ref-x> / sum |net(x)-x|^2,   clipped to [0, 1].

    Fit on TRAINING scenes, apply everywhere: k* -> 1 when the net's
    correction is trustworthy (noisy inputs), -> 0 when the input is already
    cleaner than the net's output fidelity, so blended inference never hurts
    in expectation. `pairs` yields (noisy, reference) HDR arrays on a common
    exposure scale.
    """
    num = 0.0
    den = 0.0
    for noisy, ref in pairs:
        out = infer_large(run_mono, np.asarray(noisy, np.float32), tile,
                          overlap, batch, rgb=rgb)
        d = out - noisy
        num += float((d * (ref - noisy)).sum())
        den += float((d * d).sum())
    return float(np.clip(num / max(den, 1e-12), 0.0, 1.0))


# The SHIPPED production floor (round 5, measured in runs/eval_floor_r5.py
# sweeps committed in NOTES_ROUND5.md): k_floor=0.5 gated at
# sigma_rel^2 > 1e-4. Chosen on TRAINING scenes (gated 0.5: means
# +3.4/+3.0/+2.4/+1.2 across tiers, two accumulated scenes at -0.39/-0.51
# worst), validated on HELD-OUT (RT0 +2.70, RT1 +2.43, Input1 +1.90,
# Input0 +1.13 vs the pure calibration's +1.28/+0.66/+0.62/+0.72 -
# ZERO held-out scene regressions). The gate separates the converged
# failure class by 4+ orders of magnitude (held-out converged scene
# s2 = 2e-8 vs noisy scenes >= 1e-4; ungated floors lose 60+ dB there).
PRODUCTION_K_FLOOR = 0.5
PRODUCTION_FLOOR_GATE = 1e-4


def blend_pair_symmetric(out_a, out_b, a, b, eps: float = 1e-12,
                         k_floor: float = 0.0,
                         floor_gate: float | None = None):
    """Production auto-blend: denoise BOTH tracers, display the k-blended
    pair mean. Returns (display, k).

    k_floor (round 5): k = max(k_estimate, k_floor). The per-frame
    estimator is structurally blind to common-mode corrections (they
    cancel in d_a - d_b), so real fixes can earn k = 0; a floor recovers
    that credit. A floor is only safe with a net whose correction
    vanishes on clean inputs — the r5 identity-augmented training
    (device_data.sample_batch_pair identity_p) exists exactly to make
    dbar ~ 0 on converged scenes so the floored term cannot hurt them.
    The shipped floor value is whatever QUALITY.md measured best on
    training tiers; 0 reproduces the r4 pure calibration.

    floor_gate: if set, the floor only applies when the observable pair
    disagreement sigma_rel^2 = mean|a-b|^2 / mean(x^2) exceeds the gate —
    a converged pair (a ~ b) keeps the pure calibration, so flooring can
    never touch scenes with no noise evidence. This is a HARD conservative
    gate, not the r4 prior's interpolated noise-indexed k (which lost
    6+ dB by transferring k across the noise axis; the gate only ever
    DISABLES the floor).

    Let a = ref + e_a, b = ref + e_b with independent zero-mean noise, and
    d_i = net(i) - i. The displayed image is

        display = x + k * dbar,   x = (a+b)/2,  dbar = (d_a+d_b)/2

    whose MSE-optimal k is k* = <dbar, ref-x>/<dbar,dbar>. The numerator is
    estimated without a reference by cross-projection:

        E<d_a, b-x> = E<d_a, (e_b-e_a)/2> = -E<d_a,e_a>/2 = E<d_a, ref-x>

    (e_b independent of d_a), and symmetrically for d_b, so

        N = (<d_a, b-x> + <d_b, a-x>) / 2 = <d_a - d_b, b - a> / 4

    is unbiased for <dbar, ref-x>. This replaces the round-3 composition
    that calibrated k on tracer A alone but applied it to the mean (the
    mean has half A's noise variance, so that k was biased high — ADVICE r3
    #1); here calibration and display use the SAME residual, both UNet
    passes contribute to the display, and k -> 0 on converged inputs.
    Works for numpy and jnp arrays.
    """
    d_a = out_a - a
    d_b = out_b - b
    dbar = (d_a + d_b) * 0.5
    num = ((d_a - d_b) * (b - a)).sum() * 0.25
    den = (dbar * dbar).sum()
    x = (a + b) * 0.5
    if isinstance(num, np.ndarray) or np.isscalar(num):
        k = float(np.clip(num / max(float(den), eps), 0.0, 1.0))
        floor = k_floor
        if floor_gate is not None:
            s2 = float(((a - b) ** 2).mean()) / max(float((x * x).mean()), eps)
            floor = k_floor if s2 > floor_gate else 0.0
        k = max(k, floor)
    else:
        k = jnp.clip(num / jnp.maximum(den, eps), 0.0, 1.0)
        floor = jnp.float32(k_floor)
        if floor_gate is not None:
            s2 = ((a - b) ** 2).mean() / jnp.maximum((x * x).mean(), eps)
            floor = jnp.where(s2 > floor_gate, floor, 0.0)
        k = jnp.maximum(k, floor)
    return x + k * dbar, k


def blend_pair_banded(out_a, out_b, a, b, n_bands: int = 6, pool: int = 16,
                      lo: float = -6.0, hi: float = 0.0, gate: float = 0.01,
                      eps: float = 1e-12):
    """Spatially-varying production auto-blend: per-band k calibrated by
    the SAME unbiased cross-projection as blend_pair_symmetric, with bands
    partitioning pixels by their LOCAL noise level. Returns
    (display, k_map) with k_map (H, W).

    Motivation (VERDICT r4 next #2): the global per-frame k is one scalar
    for the whole image, so a frame that is converged in most regions but
    streaky in one corner averages to a small k everywhere — the measured
    oracle-k headroom (+2.2 dB available where global auto-k extracts
    +1.2 on RT0). A LOCAL k lets converged regions keep k ~ 0 while noisy
    regions take the full correction.

    Construction:
      * Noise index: sigma_rel^2(p) = pool(|a-b|^2) / pool(lum(x))^2 — the
        pooled (16x16 default) pair disagreement relative to local
        luminance, the same observable fit_blend_prior buckets on, but
        calibrated ON THIS FRAME by its own pair statistics instead of
        transferred from training scenes (the transfer is what made the
        prior lose 6+ dB on held-out scenes).
      * Soft band assignment: each pixel splits its weight linearly
        between the two nearest of n_bands log10-spaced bands, so k_map is
        continuous in the noise index (no band-seam artifacts) and the
        per-band dot products still sum exactly over pixels.
      * Per-band k_j = clip(N_j / D_j) with N_j, D_j the band-restricted
        cross-projection numerator <d_a - d_b, b - a>/4 and energy
        <dbar, dbar> (unbiased per band up to the pooled index's 1/pool^2
        self-correlation — the pooling is what keeps band assignment
        nearly independent of any one pixel's noise draw).
      * Evidence gate: a band holding < gate of the total correction
        energy falls back to the GLOBAL k (a handful of residuals would
        make its ratio clip to 0 or 1 by luck — the same failure
        fit_blend_prior's evidence-mass gate guards against).

    Measured numbers live in QUALITY.md (runs/quality_report.py carries a
    banded column next to the global-k production column).
    """
    import jax
    import jax.numpy as jnp

    out_a, out_b = jnp.asarray(out_a), jnp.asarray(out_b)
    a, b = jnp.asarray(a), jnp.asarray(b)
    d_a = out_a - a
    d_b = out_b - b
    dbar = (d_a + d_b) * 0.5
    x = (a + b) * 0.5

    h, w = a.shape[:2]
    hp, wp = max(1, h // pool), max(1, w // pool)
    down_up = lambda z: jax.image.resize(
        jax.image.resize(z, (hp, wp), "linear"), (h, w), "linear")
    diff2 = down_up(((a - b) ** 2).mean(-1))
    lum2 = down_up((x * x).mean(-1))
    s2 = diff2 / jnp.maximum(lum2, eps)
    idx = jnp.clip((jnp.log10(jnp.maximum(s2, 1e-30)) * 0.5 - lo)
                   / (hi - lo) * (n_bands - 1), 0.0, n_bands - 1.0)
    i0 = jnp.floor(idx).astype(jnp.int32)
    t = idx - i0
    oh = (jax.nn.one_hot(i0, n_bands) * (1.0 - t)[..., None]
          + jax.nn.one_hot(jnp.minimum(i0 + 1, n_bands - 1), n_bands)
          * t[..., None])                                   # (H, W, n_bands)

    num_p = ((d_a - d_b) * (b - a)).sum(-1) * 0.25          # (H, W)
    den_p = (dbar * dbar).sum(-1)
    n_band = (oh * num_p[..., None]).sum((0, 1))            # (n_bands,)
    d_band = (oh * den_p[..., None]).sum((0, 1))
    den_tot = jnp.maximum(den_p.sum(), eps)
    k_glob = jnp.clip(num_p.sum() / den_tot, 0.0, 1.0)
    k_band = jnp.clip(n_band / jnp.maximum(d_band, eps), 0.0, 1.0)
    k_band = jnp.where(d_band > gate * den_tot, k_band, k_glob)
    k_map = (oh * k_band).sum(-1)                           # (H, W)
    return x + k_map[..., None] * dbar, k_map


def fit_blend_prior(samples, n_buckets: int = 6,
                    lo: float = -6.0, hi: float = 0.0) -> np.ndarray:
    """Fit the noise-indexed blend prior k_prior(sigma_rel).

    The per-frame pair calibration (blend_pair_symmetric) is unbiased for
    the net's TRACER-INDEPENDENT noise removal, but structurally blind to
    common-mode corrections: an artifact shared by both tracers (bin-spoke
    quantization, discretization bias) cancels in d_a - d_b, so a net that
    fixes it earns k ~ 0 even when the fix is real (measured in r4:
    raw-net gain +0.86 dB at auto-k 0.002 on a clean held-out scene). The
    missing credit is recoverable OFFLINE: on training scenes, where ref
    exists, fit the MSE-optimal k as a function of the observable pair
    disagreement sigma_rel^2 = mean|a-b|^2 / mean(x^2), bucketed in log10.

    samples: iterable of (out_a, out_b, a, b, ref) arrays.
    Returns a (n_buckets, 2) table [log10 sigma_rel, k*]; empty buckets
    fill DIRECTIONALLY (0 below the lowest fitted bucket, nearest-neighbor
    above the highest, linear interpolation in interior gaps — see the
    comments below for why).

    DIAGNOSTIC ONLY: production measured this prior at -6.1 to -8.9 dB on
    held-out realtime tiers (QUALITY.md r4) — its k floor overrides the
    near-zero k converged scenes need. AIAccelerator accepts it only via
    an explicit blend_prior= argument (from_checkpoint never auto-loads
    prior files), and runs/quality_report.py deliberately saves its
    diagnostic table away from checkpoints.
    """
    num = np.zeros(n_buckets)
    den = np.zeros(n_buckets)
    centers = np.linspace(lo, hi, n_buckets)
    for out_a, out_b, a, b, ref in samples:
        x = (a + b) * 0.5
        dbar = ((out_a - a) + (out_b - b)) * 0.5
        s2 = float(((a - b) ** 2).mean() / max(float((x * x).mean()), 1e-12))
        i = int(np.clip(round((np.log10(max(s2, 1e-30)) / 2 - lo)
                              / (hi - lo) * (n_buckets - 1)), 0,
                        n_buckets - 1))
        num[i] += float((dbar * (ref - x)).sum())
        den[i] += float((dbar * dbar).sum())
    # A bucket counts as FITTED only when it carries meaningful evidence
    # mass: den is the energy of the net's correction in that bucket, so a
    # bucket holding <0.1% of the total is a handful of near-zero residuals
    # whose ratio clips to 0 or 1 by luck (the first fit produced k=1.0 in
    # every low-noise bucket this way).
    fitted = den > 1e-3 * max(den.sum(), 1e-12)
    k = np.where(fitted, np.clip(num / np.maximum(den, 1e-12), 0.0, 1.0),
                 np.nan)
    # Empty-bucket fill is DIRECTIONAL: as sigma_rel -> 0 the optimal k -> 0
    # (a converged input means any correction is pure error), so buckets
    # BELOW the lowest fitted one get 0 — never a noisy bucket's k. (The
    # first fit of this table filled low-noise buckets nearest-neighbor
    # with k=1 from the noisy end; a near-converged held-out scene then got
    # k_prior=1 and lost 70 dB. Evidence: runs/quality_QUALITY.log first
    # run, prior_gain -6.4 dB driven entirely by that scene.) Buckets above
    # the highest fitted one keep nearest-neighbor (more noise -> at least
    # as much credit); interior gaps interpolate between fitted neighbors.
    if np.isnan(k).all():
        k = np.zeros(n_buckets)
    else:
        idx = np.where(~np.isnan(k))[0]
        lo_fit, hi_fit = idx[0], idx[-1]
        for j in range(n_buckets):
            if not np.isnan(k[j]):
                continue
            if j < lo_fit:
                k[j] = 0.0
            elif j > hi_fit:
                k[j] = k[hi_fit]
            else:
                below = idx[idx < j][-1]
                above = idx[idx > j][0]
                t = (j - below) / (above - below)
                k[j] = (1 - t) * k[below] + t * k[above]
    return np.stack([centers, k], axis=-1)


def blend_prior_lookup(table, a, b):
    """k_prior for a pair via piecewise-linear interp over log10 sigma_rel.

    Works under jit (jnp.interp on device scalars)."""
    x = (a + b) * 0.5
    s2 = ((a - b) ** 2).mean() / jnp.maximum((x * x).mean(), 1e-12)
    logs = jnp.log10(jnp.maximum(s2, 1e-30)) * 0.5
    t = jnp.asarray(table)
    return jnp.interp(logs, t[:, 0], t[:, 1])


def blend_from_pair(out, x, other, eps: float = 1e-12):
    """Per-image residual-blend factor self-calibrated from the tracer pair.

    For d = net(x) - x, the MSE-optimal blend is k* = <d, ref-x>/<d,d>
    (fit_blend). In production there is no ref — but the engine always runs
    TWO independent tracers (the dual-tracer variance design,
    Simulation.cs:78): `other` is an unbiased estimate of ref whose noise is
    independent of x, so E<d, other-ref> = 0 and

        k = <d, other - x> / <d, d>,  clipped to [0, 1]

    is an unbiased estimate of k* computable every frame on device (two dot
    products). Noise-free inputs give other ~= x -> k ~= 0 (the denoiser
    backs itself off instead of degrading an already-converged image);
    streaky 1-frame inputs give k -> 1. Works for numpy and jnp arrays.
    """
    d = out - x
    num = (d * (other - x)).sum()
    den = (d * d).sum()
    if isinstance(num, np.ndarray) or np.isscalar(num):
        return float(np.clip(num / max(float(den), eps), 0.0, 1.0))
    return jnp.clip(num / jnp.maximum(den, eps), 0.0, 1.0)


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
