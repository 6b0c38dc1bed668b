"""Litbox denoiser UNet in Flax (reference: litbox_model.py).

Exact architecture parity with LitboxDenoiserNet (litbox_model.py:27-302):
single-channel UNet with
  conv_in:    3x3 conv -> ReLU -> ResidualBlock            (:268-275)
  encoders:   unet_size x [ResBlock(C->2C), MaxPool2]      (:277-280)
  bottleneck: ResBlock(C->2C), ResBlock(2C->2C)            (:282-288)
  decoders:   unet_size x [3x3 conv C->4*(C/2), PixelShuffle(2),
              concat skip, 2x ResBlock]                    (:290-302)
  conv_out:   3x3 conv -> 1 channel (+ optional sigmoid)   (:95-98)
ResidualBlock = conv-BN-ReLU-conv-BN + 1x1 shortcut, final ReLU (:5-25).

Production config (train_litbox_denoiser.py:37-43): unet_size=5,
initial_features=32, reflect padding, no input normalization, no log space.
The stateful pre/post_transform pairing guard of the reference
(litbox_model.py:100-114,257-266) is replaced by pure functions returning
the normalization stats (SURVEY.md section 7 hard parts).

Data layout is NHWC (TPU-native); PixelShuffle uses the torch channel-major
order so torch weights transfer losslessly (see tests/test_unet_parity.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _pad(x: jax.Array, padding_mode: str) -> jax.Array:
    mode = {"reflect": "reflect", "zeros": "constant", "replicate": "edge"}[padding_mode]
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode)


class Conv3x3(nn.Module):
    features: int
    padding_mode: str = "reflect"

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (3, 3), padding="VALID")(_pad(x, self.padding_mode))


class ResidualBlock(nn.Module):
    """conv-BN-ReLU-conv-BN + shortcut, final ReLU (litbox_model.py:5-25)."""

    features: int
    padding_mode: str = "reflect"

    @nn.compact
    def __call__(self, x, train: bool):
        shortcut = x
        if x.shape[-1] != self.features:
            shortcut = nn.Conv(self.features, (1, 1), name="shortcut")(x)
        y = Conv3x3(self.features, self.padding_mode, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn1")(y)
        y = nn.relu(y)
        y = Conv3x3(self.features, self.padding_mode, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn2")(y)
        return nn.relu(y + shortcut)


def pixel_shuffle(x: jax.Array, r: int = 2) -> jax.Array:
    """torch.nn.PixelShuffle in NHWC: channel index c*r*r + i*r + j."""
    b, h, w, c = x.shape
    co = c // (r * r)
    x = x.reshape(b, h, w, co, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, co)


class LitboxDenoiserNet(nn.Module):
    """Single-channel denoiser UNet (litbox_model.py:27-302).

    global_residual=True adds the network input to the output with a
    zero-initialized final conv, so the untrained model IS the identity and
    training only learns the noise correction — standard practice for
    budget-bound denoiser training. Off by default: the reference
    architecture has no global skip, and torch-parity import/export
    (import_torch_state / nn.export) uses the reference layout.
    """

    unet_size: int = 5
    initial_features: int = 32
    padding_mode: str = "reflect"
    use_sigmoid: bool = False
    global_residual: bool = False
    # 1 = the reference's mono architecture (channels processed as batch,
    # weight-interchangeable with litbox_model.py). 3 = the TPU realtime
    # display variant: one RGB pass costs 1/3 of three mono passes, and on
    # TPU the mono batch buys nothing (channel lanes are padded to 128
    # either way; runs/prof_display3.py).
    out_channels: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.initial_features
        pm = self.padding_mode

        # Initial feature extraction (conv -> ReLU -> ResBlock).
        y = nn.relu(Conv3x3(f, pm, name="conv_in")(x))
        y = ResidualBlock(f, pm, name="res_in")(y, train)

        skips = []
        c = f
        for i in range(self.unet_size):
            c *= 2
            y = ResidualBlock(c, pm, name=f"enc{i}")(y, train)
            skips.append(y)
            y = nn.max_pool(y, (2, 2), strides=(2, 2))

        c *= 2
        y = ResidualBlock(c, pm, name="bott0")(y, train)
        y = ResidualBlock(c, pm, name="bott1")(y, train)

        for i in range(self.unet_size):
            c //= 2
            # Decoder: conv to 4*C/2 channels then PixelShuffle(2)
            # (zero padding here, matching the reference's default-pad conv,
            # litbox_model.py:293).
            y = Conv3x3(c * 4, "zeros", name=f"dec{i}")(y)
            y = pixel_shuffle(y, 2)
            y = jnp.concatenate([y, skips[self.unet_size - 1 - i]], axis=-1)
            y = ResidualBlock(c, pm, name=f"skip{i}a")(y, train)
            y = ResidualBlock(c, pm, name=f"skip{i}b")(y, train)

        if self.global_residual:
            y = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                        name="conv_out",
                        kernel_init=nn.initializers.zeros)(y)
            y = y + x
        else:
            y = Conv3x3(self.out_channels, "zeros", name="conv_out")(y)
        if self.use_sigmoid:
            y = nn.sigmoid(y)
        return y


@dataclasses.dataclass(frozen=True)
class TransformConfig:
    """pre/post transform flags (litbox_model.py:100-114, 257-266)."""

    use_log_space: bool = False
    normalize_input: bool = False
    epsilon: float = 1e-6


def pre_transform(x: jax.Array, cfg: TransformConfig) -> tuple[jax.Array, Any]:
    """Pure version of LitboxDenoiserNet.pre_transform: returns (x, stats)."""
    stats = None
    if cfg.use_log_space:
        x = jnp.log2(x + cfg.epsilon)
    if cfg.normalize_input:
        mean = x.mean(axis=(1, 2), keepdims=True)
        std = x.std(axis=(1, 2), keepdims=True)
        x = (x - mean) / (std + cfg.epsilon)
        stats = (mean, std)
    return x, stats


def post_transform(x: jax.Array, stats: Any, cfg: TransformConfig) -> jax.Array:
    if cfg.normalize_input and stats is not None:
        mean, std = stats
        x = x * (std + cfg.epsilon) + mean
    if cfg.use_log_space:
        # Clip the exponent: 2^40 ~ 1e12 is far beyond any radiance and an
        # unclipped training spike would overflow f32 to inf (the loss then
        # poisons Adam state for the rest of the run).
        x = jnp.exp2(jnp.clip(x, -40.0, 40.0)) - cfg.epsilon
    return x


def import_torch_state(torch_state: dict, unet_size: int = 5) -> dict:
    """Convert a litbox_model.py state_dict into flax params/batch_stats.

    Name mapping between the reference's module lists and this module's
    named blocks; conv weights transpose (O, I, kh, kw) -> (kh, kw, I, O).
    """
    import numpy as np

    params: dict = {}
    stats: dict = {}

    def conv(dst, prefix):
        params[dst] = {
            "kernel": np.transpose(np.asarray(torch_state[prefix + ".weight"]), (2, 3, 1, 0)),
            "bias": np.asarray(torch_state[prefix + ".bias"]),
        }

    def bn(dst, prefix):
        params[dst] = {
            "scale": np.asarray(torch_state[prefix + ".weight"]),
            "bias": np.asarray(torch_state[prefix + ".bias"]),
        }
        stats[dst] = {
            "mean": np.asarray(torch_state[prefix + ".running_mean"]),
            "var": np.asarray(torch_state[prefix + ".running_var"]),
        }

    def resblock(dst, prefix, has_shortcut):
        conv(f"{dst}/conv1/Conv_0", prefix + ".primary.0")
        bn(f"{dst}/bn1", prefix + ".primary.1")
        conv(f"{dst}/conv2/Conv_0", prefix + ".primary.3")
        bn(f"{dst}/bn2", prefix + ".primary.4")
        if has_shortcut:
            conv(f"{dst}/shortcut", prefix + ".shortcut")

    conv("conv_in/Conv_0", "conv_in.0")
    resblock("res_in", "conv_in.2", has_shortcut=False)
    for i in range(unet_size):
        resblock(f"enc{i}", f"unet_encoders.{i}", has_shortcut=True)
    resblock("bott0", "bottleneck.0", has_shortcut=True)
    resblock("bott1", "bottleneck.1", has_shortcut=False)
    for i in range(unet_size):
        conv(f"dec{i}/Conv_0", f"unet_decoders.{i}.0")
        resblock(f"skip{i}a", f"unet_skipconns.{i}.0", has_shortcut=True)
        resblock(f"skip{i}b", f"unet_skipconns.{i}.1", has_shortcut=False)
    conv("conv_out/Conv_0", "conv_out")

    def nest(flat: dict) -> dict:
        out: dict = {}
        for path, leaf in flat.items():
            node = out
            parts = path.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = leaf
        return out

    return {"params": nest({k: v for k, v in params.items()}),
            "batch_stats": nest({k: v for k, v in stats.items()})}
