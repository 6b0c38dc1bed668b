"""Spec-level validation of the hand-rolled ONNX exporter.

No `onnx`/`onnxruntime` in this image, so correctness is established
independently: the emitted file is decoded with a generic protobuf wire
reader (written here, sharing no code with nn.onnx_writer's encoder) and
executed by a numpy interpreter of the ONNX op semantics (Conv,
BatchNormalization, Relu, MaxPool, Concat, DepthToSpace CRD, Pad reflect,
Add, Sigmoid, Identity — opset 13). The interpreted output must match the
flax network bit-for-bit-tolerance, proving the graph topology, attributes,
and weight serialization are all right.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from litbox_tpu.nn.export import export_onnx
from litbox_tpu.nn.unet import LitboxDenoiserNet

# ------------------------------------------------ generic protobuf decode


def _read_varint(buf, i):
    n = shift = 0
    while True:
        b = buf[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7


def decode_message(buf):
    """Return {field_number: [raw values]}; wire 0 -> int, wire 2 -> bytes,
    wire 5 -> 4 raw bytes."""
    out = {}
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, i = _read_varint(buf, i)
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            v = bytes(buf[i:i + ln])
            i += ln
        elif wire == 5:
            v = bytes(buf[i:i + 4])
            i += 4
        else:
            raise ValueError(f"wire type {wire}")
        out.setdefault(field, []).append(v)
    return out


def _decode_attr(raw):
    a = decode_message(raw)
    name = a[1][0].decode()
    atype = a[20][0]
    if atype == 1:
        return name, np.frombuffer(a[2][0], "<f4")[0]
    if atype == 2:
        return name, a[3][0]
    if atype == 3:
        return name, a[4][0].decode()
    if atype == 7:
        vals, i = [], 0
        packed = a[8][0]
        while i < len(packed):
            v, i = _read_varint(packed, i)
            vals.append(v)
        return name, vals
    raise ValueError(atype)


def _decode_tensor(raw):
    t = decode_message(raw)
    dims = [d for d in t.get(1, [])]
    dtype = t.get(2, [1])[0]
    arr = np.frombuffer(t[9][0], "<i8" if dtype == 7 else "<f4")
    return t[8][0].decode(), arr.reshape(dims)


def decode_model(path):
    with open(path, "rb") as f:
        model = decode_message(f.read())
    assert model[1][0] == 8  # IR version
    opset = decode_message(model[8][0])
    assert opset[2][0] == 13
    graph = decode_message(model[7][0])
    nodes = []
    for raw in graph[1]:
        n = decode_message(raw)
        nodes.append(dict(
            op=n[4][0].decode(),
            inputs=[s.decode() for s in n.get(1, [])],
            outputs=[s.decode() for s in n.get(2, [])],
            attrs=dict(_decode_attr(a) for a in n.get(5, [])),
        ))
    inits = dict(_decode_tensor(raw) for raw in graph.get(5, []))
    return nodes, inits


# ------------------------------------------------- numpy onnx interpreter


def _conv(x, w, b, pads, strides):
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), window_strides=strides,
        padding=[(pads[0], pads[2]), (pads[1], pads[3])],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return np.asarray(out + jnp.asarray(b)[None, :, None, None])


def run_graph(nodes, inits, x):
    env = dict(inits)
    env["input"] = x
    for n in nodes:
        a = n["attrs"]
        ins = [env[i] for i in n["inputs"]]
        op = n["op"]
        if op == "Conv":
            y = _conv(ins[0], ins[1], ins[2], a["pads"], a["strides"])
        elif op == "BatchNormalization":
            xx, scale, bias, mean, var = ins
            y = (xx - mean[None, :, None, None]) / np.sqrt(
                var[None, :, None, None] + a["epsilon"])
            y = y * scale[None, :, None, None] + bias[None, :, None, None]
        elif op == "Relu":
            y = np.maximum(ins[0], 0)
        elif op == "MaxPool":
            b_, c, h, w = ins[0].shape
            y = ins[0].reshape(b_, c, h // 2, 2, w // 2, 2).max((3, 5))
        elif op == "Concat":
            y = np.concatenate(ins, axis=a["axis"])
        elif op == "DepthToSpace":
            assert a["mode"] == "CRD"
            r = a["blocksize"]
            b_, c, h, w = ins[0].shape
            y = ins[0].reshape(b_, c // (r * r), r, r, h, w)
            y = y.transpose(0, 1, 4, 2, 5, 3).reshape(b_, c // (r * r), h * r, w * r)
        elif op == "Pad":
            assert a["mode"] == "reflect"
            p = ins[1].astype(int)
            rank = ins[0].ndim
            width = [(p[k], p[k + rank]) for k in range(rank)]
            y = np.pad(ins[0], width, mode="reflect")
        elif op == "Add":
            y = ins[0] + ins[1]
        elif op == "Sigmoid":
            y = 1.0 / (1.0 + np.exp(-ins[0]))
        elif op == "Identity":
            y = ins[0]
        else:
            raise ValueError(op)
        env[n["outputs"][0]] = y.astype(np.float32)
    return env["output"]


# ------------------------------------------------------------------ tests


@pytest.mark.parametrize("padding_mode,use_sigmoid", [("reflect", False),
                                                      ("zeros", True)])
def test_onnx_executes_to_flax_output(tmp_path, padding_mode, use_sigmoid):
    unet_size, feats = 2, 4
    net = LitboxDenoiserNet(unet_size=unet_size, initial_features=feats,
                            padding_mode=padding_mode, use_sigmoid=use_sigmoid)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 1)).astype(np.float32))
    variables = net.init(jax.random.key(0), x, train=False)
    # non-trivial batch stats so BatchNormalization is actually exercised
    variables = jax.tree.map(
        lambda v: v + 0.05 * jnp.asarray(
            rng.normal(size=v.shape).astype(np.float32)) ** 2, variables)
    expected = np.asarray(net.apply(variables, x, train=False))

    path = str(tmp_path / "denoiser.onnx")
    export_onnx(variables, path, unet_size=unet_size, initial_features=feats,
                padding_mode=padding_mode, use_sigmoid=use_sigmoid)

    nodes, inits = decode_model(path)
    got = run_graph(nodes, inits, np.asarray(x).transpose(0, 3, 1, 2))
    np.testing.assert_allclose(got.transpose(0, 2, 3, 1), expected,
                               rtol=1e-4, atol=1e-5)


def test_onnx_rgb_global_residual_variant(tmp_path):
    """The realtime display net (out_channels=3, global residual) exports
    and executes too."""
    net = LitboxDenoiserNet(unet_size=2, initial_features=4,
                            out_channels=3, global_residual=True)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    variables = net.init(jax.random.key(1), x, train=False)
    variables = jax.tree.map(
        lambda v: v + 0.05 * jnp.asarray(
            rng.normal(size=v.shape).astype(np.float32)) ** 2, variables)
    expected = np.asarray(net.apply(variables, x, train=False))

    path = str(tmp_path / "denoiser_rgb.onnx")
    export_onnx(variables, path, unet_size=2, initial_features=4,
                global_residual=True)
    nodes, inits = decode_model(path)
    got = run_graph(nodes, inits, np.asarray(x).transpose(0, 3, 1, 2))
    np.testing.assert_allclose(got.transpose(0, 2, 3, 1), expected,
                               rtol=1e-4, atol=1e-5)


def test_onnx_node_parity_with_torch_mirror(tmp_path):
    """Node-count/shape parity against the torch mirror (VERDICT r2 next
    #8): one ONNX Conv per torch Conv2d, one BatchNormalization per
    BatchNorm2d, initializer shapes equal the mirror state_dict's."""
    from litbox_tpu.nn.export import build_torch_module

    unet_size, feats = 2, 4
    net = LitboxDenoiserNet(unet_size=unet_size, initial_features=feats)
    x = jnp.zeros((1, 16, 16, 1), jnp.float32)
    variables = net.init(jax.random.key(2), x, train=False)
    path = str(tmp_path / "parity.onnx")
    export_onnx(variables, path, unet_size=unet_size, initial_features=feats)
    nodes, inits = decode_model(path)

    mirror = build_torch_module(variables, unet_size, feats)
    import torch
    n_conv = sum(1 for m in mirror.modules() if isinstance(m, torch.nn.Conv2d))
    n_bn = sum(1 for m in mirror.modules()
               if isinstance(m, torch.nn.BatchNorm2d))
    ops = [n["op"] for n in nodes]
    assert ops.count("Conv") == n_conv
    assert ops.count("BatchNormalization") == n_bn
    assert ops.count("MaxPool") == unet_size
    assert ops.count("DepthToSpace") == unet_size == ops.count("Concat")

    mirror_state = mirror.state_dict()
    for name, arr in inits.items():
        if name.endswith("_pads"):
            continue
        key = name.replace(".running_mean", ".running_mean")
        assert tuple(arr.shape) == tuple(mirror_state[key].shape), name
