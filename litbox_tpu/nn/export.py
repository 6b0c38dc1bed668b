"""Portable denoiser export: flax -> torch state_dict / TorchScript.

The reference trains in PyTorch and exports ONNX for the in-engine runtime
(train_litbox_denoiser.py:276-281). This environment has torch (CPU) but no
`onnx` package, so the portable interchange formats are:

  * export_torch_state / save_torch_checkpoint — the exact inverse of
    unet.import_torch_state: a reference-compatible state_dict (same key
    names as litbox_model.py's module tree), loadable by the reference's
    own PyTorch code or convertible to ONNX on any machine with onnx
    installed (see export_onnx, which gates on the package).
  * export_torchscript — a traced TorchScript module (runs under any
    libtorch runtime, the closest verifiable-here analog of ONNX).

TorchMirror is an independent re-implementation of THIS repo's flax
architecture in torch (not copied from the reference); parity is asserted
by tests/test_export.py via the round trip flax -> state_dict -> mirror.
"""

from __future__ import annotations

import numpy as np


def export_torch_state(variables: dict, unet_size: int = 5,
                       global_residual: bool = False) -> dict:
    """flax {params, batch_stats} -> reference-layout torch state_dict
    (numpy arrays; pass through torch.save for a .pth).

    global_residual nets name the final conv `conv_out` directly (a plain
    nn.Conv in unet.LitboxDenoiserNet) instead of the Conv3x3 wrapper's
    `conv_out/Conv_0`."""
    params = variables["params"]
    stats = variables["batch_stats"]
    out: dict = {}

    def get(tree, path):
        node = tree
        for p in path.split("/"):
            node = node[p]
        return node

    def conv(prefix, dst):
        p = get(params, prefix)
        out[dst + ".weight"] = np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1))
        out[dst + ".bias"] = np.asarray(p["bias"])

    def bn(prefix, dst):
        p = get(params, prefix)
        s = get(stats, prefix)
        out[dst + ".weight"] = np.asarray(p["scale"])
        out[dst + ".bias"] = np.asarray(p["bias"])
        out[dst + ".running_mean"] = np.asarray(s["mean"])
        out[dst + ".running_var"] = np.asarray(s["var"])
        out[dst + ".num_batches_tracked"] = np.asarray(0, np.int64)

    def resblock(prefix, dst, has_shortcut):
        conv(f"{prefix}/conv1/Conv_0", dst + ".primary.0")
        bn(f"{prefix}/bn1", dst + ".primary.1")
        conv(f"{prefix}/conv2/Conv_0", dst + ".primary.3")
        bn(f"{prefix}/bn2", dst + ".primary.4")
        if has_shortcut:
            conv(f"{prefix}/shortcut", dst + ".shortcut")

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
    conv("conv_out" if global_residual else "conv_out/Conv_0", "conv_out")
    return out


def _torch_mirror(unet_size: int, initial_features: int,
                  padding_mode: str = "reflect", use_sigmoid: bool = False):
    """Torch re-implementation of nn.unet.LitboxDenoiserNet with the
    reference state_dict layout (module names match import_torch_state)."""
    import torch
    from torch import nn

    def conv3(ci, co, pm):
        return nn.Conv2d(ci, co, 3, padding=1, padding_mode=pm)

    class ResBlock(nn.Module):
        def __init__(self, ci, co, pm):
            super().__init__()
            self.primary = nn.Sequential(
                conv3(ci, co, pm), nn.BatchNorm2d(co), nn.ReLU(),
                conv3(co, co, pm), nn.BatchNorm2d(co))
            self.shortcut = nn.Conv2d(ci, co, 1) if ci != co else nn.Identity()

        def forward(self, x):
            return torch.relu(self.primary(x) + self.shortcut(x))

    class Mirror(nn.Module):
        def __init__(self):
            super().__init__()
            f = initial_features
            pm = padding_mode
            self.conv_in = nn.Sequential(conv3(1, f, pm), nn.ReLU(),
                                         ResBlock(f, f, pm))
            encs, c = [], f
            for _ in range(unet_size):
                encs.append(ResBlock(c, c * 2, pm))
                c *= 2
            self.unet_encoders = nn.ModuleList(encs)
            self.bottleneck = nn.Sequential(ResBlock(c, c * 2, pm),
                                            ResBlock(c * 2, c * 2, pm))
            c *= 2
            decs, skips = [], []
            for _ in range(unet_size):
                c //= 2
                decs.append(nn.Sequential(nn.Conv2d(c * 2, c * 4, 3, padding=1),
                                          nn.PixelShuffle(2)))
                skips.append(nn.Sequential(ResBlock(c * 2, c, pm),
                                           ResBlock(c, c, pm)))
            self.unet_decoders = nn.ModuleList(decs)
            self.unet_skipconns = nn.ModuleList(skips)
            self.conv_out = nn.Conv2d(f * 2, 1, 3, padding=1)
            self.pool = nn.MaxPool2d(2)
            self.use_sigmoid = use_sigmoid

        def forward(self, x):
            y = self.conv_in(x)
            skips = []
            for enc in self.unet_encoders:
                y = enc(y)
                skips.append(y)
                y = self.pool(y)
            y = self.bottleneck(y)
            for i, (dec, skip) in enumerate(zip(self.unet_decoders,
                                                self.unet_skipconns)):
                y = dec(y)
                y = torch.cat([y, skips[len(skips) - 1 - i]], dim=1)
                y = skip(y)
            y = self.conv_out(y)
            return torch.sigmoid(y) if self.use_sigmoid else y

    return Mirror()


def build_torch_module(variables: dict, unet_size: int = 5,
                       initial_features: int = 32,
                       padding_mode: str = "reflect",
                       use_sigmoid: bool = False):
    """Instantiate the torch mirror and load the flax weights into it."""
    import torch

    net = _torch_mirror(unet_size, initial_features, padding_mode, use_sigmoid)
    state = {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in export_torch_state(variables, unet_size).items()}
    net.load_state_dict(state)
    net.eval()
    return net


def save_torch_checkpoint(variables: dict, path: str, unet_size: int = 5):
    """Reference-compatible .pth (plain state_dict, litbox_model.py layout)."""
    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in export_torch_state(variables, unet_size).items()},
               path)


def export_torchscript(variables: dict, path: str, unet_size: int = 5,
                       initial_features: int = 32,
                       padding_mode: str = "reflect",
                       example_size: int = 64):
    """Traced TorchScript module — portable to any libtorch runtime."""
    import torch

    net = build_torch_module(variables, unet_size, initial_features, padding_mode)
    example = torch.zeros(1, 1, example_size, example_size)
    with torch.no_grad():
        traced = torch.jit.trace(net, example)
    traced.save(path)
    return path


def export_onnx(variables: dict, path: str, unet_size: int = 5,
                initial_features: int = 32, padding_mode: str = "reflect",
                use_sigmoid: bool = False, global_residual: bool = False):
    """ONNX artifact (reference: train_litbox_denoiser.py:276-281 exports
    `denoiser.onnx` with dynamic batch).

    No `onnx` package exists in this image, so the protobuf is emitted
    directly by nn.onnx_writer (the UNet uses only Conv/BatchNormalization/
    Relu/MaxPool/Concat/DepthToSpace/Pad/Add/Sigmoid, all stable at opset
    13). Input/output are NCHW with symbolic batch/height/width dims —
    strictly more dynamic than the reference's batch-only dynamic axes.
    tests/test_onnx_export.py re-decodes and EXECUTES the emitted file
    against the flax network."""
    del initial_features  # implied by the weight shapes
    from .onnx_writer import write_onnx_unet

    state = export_torch_state(variables, unet_size,
                               global_residual=global_residual)
    in_channels = state["conv_in.0.weight"].shape[1]
    return write_onnx_unet(state, path, unet_size=unet_size,
                           padding_mode=padding_mode, use_sigmoid=use_sigmoid,
                           in_channels=in_channels,
                           global_residual=global_residual)
