"""Training losses (reference: litbox_loss.py).

HdrLoss: adaptive-weighted L2 + Sobel gradient L1 + plain L1
(litbox_loss.py:8-75), production coefficients alpha=1.5, beta=0.4,
gamma=0.2, base_weight=0.5 (train_litbox_denoiser.py:44-47,179).
SSIM is provided for evaluation parity (litbox_loss.py:156-198).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

SOBEL_X = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
SOBEL_Y = jnp.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], jnp.float32)


def _depthwise3x3(x: jax.Array, k: jax.Array) -> jax.Array:
    """'same' depthwise 3x3 correlation over NHWC."""
    c = x.shape[-1]
    kernel = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


@dataclasses.dataclass(frozen=True)
class HdrLossConfig:
    alpha: float = 1.5        # bright-pixel weight exponent
    beta: float = 0.4         # gradient term weight
    gamma: float = 0.2        # plain L1 weight
    base_weight: float = 0.5  # dark bias
    # Optional ceiling on the adaptive weight (None = reference behavior).
    # HDR peaks make (target+base)^alpha span 1e4+ within a batch, so a
    # single bright crop dominates every gradient at short-budget learning
    # rates; the reference absorbs this with lr 1e-5 over days.
    weight_cap: float | None = None
    # Normalize the adaptive-L2 term by the batch-mean weight: keeps the
    # reference's RELATIVE bright-pixel emphasis but pins the loss scale to
    # MSE units. Round-3 training without this oscillated over 4 orders of
    # magnitude batch-to-batch (runs/phase2_r3.log) because a single bright
    # crop rescales the whole objective.
    normalize_weights: bool = False
    # Weight of a relative-error (log-space) L1 term:
    #   mean |log2(relu(pred)+eps) - log2(target+eps)|.
    # Targets the black floor: in 8-bit gamma space a linear error of 2e-4
    # in a zero region is ~5/255 of glow, which halved golden SSIM in r3
    # (runs/diag_ssim.py: all SSIM loss sits at ref-lum < 0.02) while being
    # invisible to linear L2/L1. Relative error makes dark-region accuracy
    # scale-free.
    log_l1: float = 0.0
    log_eps: float = 1e-5
    # Compute the adaptive-L2/gradient/L1 terms on range-compressed values:
    # 'log1p' maps x -> log2(1 + x). Realtime-tier training inputs are
    # single-frame MC renders whose isolated deposit texels reach 1e3-1e4x
    # the exposure-normalized mean; in linear space those few texels ARE the
    # loss (r4 pilot: batch loss swung 0.85 -> 37k with normalized weights),
    # so the gradient signal is outlier-gated. log1p keeps darks linear
    # (log2(1+x) ~ x/ln2 for small x) while compressing spikes to O(10).
    compress: str = "none"
    # Weight of a bounded RELATIVE L2 term on the UNCOMPRESSED values:
    #   mean(((pred - target) / (target + rel_eps))^2).
    # Round-5 finding: with log-space global_residual the net's errors are
    # MULTIPLICATIVE (out = x * exp(f)), and log-compressed terms barely
    # see a x17 amplification of a bright pixel while linear PSNR — the
    # quality metric — is dominated by it (held-out converged scene at
    # raw -75 dB from 680 bright pixels). The ratio form penalizes
    # multiplicative error directly yet stays BOUNDED when the target is
    # a spike and the prediction reasonable (<= 1), so it cannot re-open
    # the r4 linear-loss instability.
    rel_l2: float = 0.0
    rel_eps: float = 1.0


def hdr_loss(pred: jax.Array, target: jax.Array,
             cfg: HdrLossConfig = HdrLossConfig()) -> jax.Array:
    raw_pred, raw_target = pred, target
    if cfg.compress == "log1p":
        pred = jnp.log2(1.0 + jnp.maximum(pred, -0.5))
        target = jnp.log2(1.0 + jnp.maximum(target, 0.0))
    weights = (target + cfg.base_weight) ** cfg.alpha
    if cfg.weight_cap is not None:
        weights = jnp.minimum(weights, cfg.weight_cap)
    if cfg.normalize_weights:
        weights = weights / jax.lax.stop_gradient(
            jnp.maximum(weights.mean(), 1e-12))
    adaptive_l2 = jnp.mean(weights * (pred - target) ** 2)

    gx_p = _depthwise3x3(pred, SOBEL_X)
    gy_p = _depthwise3x3(pred, SOBEL_Y)
    gx_t = _depthwise3x3(target, SOBEL_X)
    gy_t = _depthwise3x3(target, SOBEL_Y)
    gradient = jnp.mean(jnp.abs(gx_p - gx_t)) + jnp.mean(jnp.abs(gy_p - gy_t))

    l1 = jnp.mean(jnp.abs(pred - target))
    loss = adaptive_l2 + cfg.beta * gradient + cfg.gamma * l1
    if cfg.rel_l2:
        rel = (raw_pred - raw_target) / (jnp.maximum(raw_target, 0.0)
                                         + cfg.rel_eps)
        loss = loss + cfg.rel_l2 * jnp.mean(rel * rel)
    if cfg.log_l1:
        rel = jnp.abs(jnp.log2(jnp.maximum(raw_pred, 0.0) + cfg.log_eps)
                      - jnp.log2(jnp.maximum(raw_target, 0.0) + cfg.log_eps))
        loss = loss + cfg.log_l1 * jnp.mean(rel)
    return loss


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jax.Array:
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return g[:, None] * g[None, :]


def ssim(a: jax.Array, b: jax.Array, window_size: int = 11) -> jax.Array:
    """Mean SSIM over NHWC batches (litbox_loss.py:156-198)."""
    w = _gaussian_window(window_size)
    mu_a = _conv_win(a, w)
    mu_b = _conv_win(b, w)
    mu_a2, mu_b2, mu_ab = mu_a**2, mu_b**2, mu_a * mu_b
    # E[x^2] - E[x]^2 cancels catastrophically in f32 on large smooth
    # images, going slightly negative and blowing up the ratio; variances
    # are nonnegative by definition, so clamp.
    s_a = jnp.maximum(_conv_win(a * a, w) - mu_a2, 0.0)
    s_b = jnp.maximum(_conv_win(b * b, w) - mu_b2, 0.0)
    s_ab = _conv_win(a * b, w) - mu_ab
    c1, c2 = 0.01**2, 0.03**2
    out = ((2 * mu_ab + c1) * (2 * s_ab + c2)) / ((mu_a2 + mu_b2 + c1) * (s_a + s_b + c2))
    return out.mean()


def _conv_win(x: jax.Array, w: jax.Array) -> jax.Array:
    c = x.shape[-1]
    kernel = jnp.tile(w[:, :, None, None], (1, 1, 1, c))
    # HIGHEST precision: TPU convs default to bf16 inputs, and SSIM's
    # E[x^2] - E[x]^2 cancellation amplifies that rounding into negative
    # "variances" and garbage scores (r5: a golden pair measured SSIM
    # -0.108 on TPU vs 0.222 on CPU for identical images). The metric
    # must be exact; perf is irrelevant at metric callsites.
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)


def psnr(a: jax.Array, b: jax.Array, peak: float = 1.0) -> jax.Array:
    mse = jnp.mean((a - b) ** 2)
    return 10.0 * jnp.log10(peak**2 / jnp.maximum(mse, 1e-12))
