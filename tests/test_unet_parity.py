"""Denoiser parity vs the reference PyTorch implementation.

The strongest possible check: instantiate the reference's litbox_model.py
(PyTorch CPU), transfer its weights into the Flax net, and compare forward
outputs on random inputs — architecture + weight-layout equivalence.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

import jax.numpy as jnp  # noqa: E402

from litbox_tpu.nn.loss import HdrLossConfig, hdr_loss  # noqa: E402
from litbox_tpu.nn.unet import (  # noqa: E402
    LitboxDenoiserNet,
    TransformConfig,
    import_torch_state,
    post_transform,
    pre_transform,
)


@pytest.mark.parametrize("unet_size,features", [(2, 4), (3, 8)])
def test_forward_matches_torch(unet_size, features):
    torch = pytest.importorskip("torch")
    from litbox_model import LitboxDenoiserNet as TorchNet

    torch.manual_seed(0)
    tnet = TorchNet(upsample_factor=1, use_sigmoid=False, use_log_space=False,
                    normalize_input=False, initial_features=features,
                    unet_size=unet_size, padding_mode="reflect")
    tnet.eval()

    rng = np.random.default_rng(0)
    size = 4 << unet_size
    x = rng.uniform(0, 4, (2, 1, size, size)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x)).numpy()

    variables = import_torch_state(
        {k: v.numpy() for k, v in tnet.state_dict().items()}, unet_size)
    jnet = LitboxDenoiserNet(unet_size=unet_size, initial_features=features)
    out = jnet.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    out = np.asarray(out).transpose(0, 3, 1, 2)

    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-4)


def test_hdr_loss_matches_torch():
    # litbox_loss.py imports torchvision (absent here); its HdrLoss.forward
    # math (litbox_loss.py:32-75) is replicated inline in torch.
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    pred = rng.uniform(0, 3, (2, 1, 32, 32)).astype(np.float32)
    target = rng.uniform(0, 3, (2, 1, 32, 32)).astype(np.float32)

    with torch.no_grad():
        p, t = torch.from_numpy(pred), torch.from_numpy(target)
        sx = torch.tensor([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=torch.float32)[None, None]
        sy = torch.tensor([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], dtype=torch.float32)[None, None]
        weights = (t + 0.5) ** 1.5
        adaptive = torch.mean(weights * (p - t) ** 2)
        grad = (F.l1_loss(F.conv2d(p, sx, padding="same"), F.conv2d(t, sx, padding="same"))
                + F.l1_loss(F.conv2d(p, sy, padding="same"), F.conv2d(t, sy, padding="same")))
        ref = float(adaptive + 0.4 * grad + 0.2 * F.l1_loss(p, t))

    ours = float(hdr_loss(jnp.asarray(pred.transpose(0, 2, 3, 1)),
                          jnp.asarray(target.transpose(0, 2, 3, 1)),
                          HdrLossConfig(1.5, 0.4, 0.2, 0.5)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_pre_post_transform_roundtrip():
    cfg = TransformConfig(use_log_space=True, normalize_input=True)
    x = jnp.asarray(np.random.default_rng(2).uniform(0.01, 5, (2, 16, 16, 1)).astype(np.float32))
    y, stats = pre_transform(x, cfg)
    back = post_transform(y, stats, cfg)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-4, atol=1e-5)
