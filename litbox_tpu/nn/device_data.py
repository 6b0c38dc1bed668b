"""On-device training-data pipeline: the TPU-native DataLoader.

The reference trains with a torch DataLoader feeding host-side crops
(train_litbox_denoiser.py:142-186); its GPU sits on PCIe next to host RAM,
so shipping a fresh batch every step is free. This environment reaches the
TPU through a ~20 MB/s tunnel, so a (16, 192, 192, 3) x2 f32 batch costs
~1 s/step — 15x the compute time of the small realtime net (measured,
runs/train_rgb r4 pilot: 1.1 s/step vs 0.065 s/step compute).

TPU-native answer: the WHOLE stage dataset lives in HBM (a 63-scene tier is
~150 MB — nothing next to 16 GB), uploaded once; every training step draws
its batch ON DEVICE inside the same jit as the gradient step:

  scene pick     -> random gather over the scene axis
  random crop    -> vmap'd dynamic_slice
  90-deg rot     -> lax.switch over the 4 rotations
  tracer swap    -> where(bernoulli, b, a)   (both tracers are inputs)
  noise2noise    -> where(bernoulli, other tracer, reference) target
  channel select -> mono nets take one random channel (reference parity,
                    train_litbox_denoiser.py:102-113)

Host -> device traffic per step: one PRNG key. Everything else never
leaves HBM. (SURVEY §2.5 output-prep / §7; this is the L7 data path
re-designed for the hardware rather than translated.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def stack_stage(paths_a, paths_b, paths_ref, scales) -> tuple:
    """Decode and stack a stage's scenes into (N, H, W, 3) f32 arrays
    (host-side, once per run). Returns (a, b, ref) numpy arrays."""
    from ..io.images import read_image_linear

    a = np.stack([read_image_linear(p) * s for p, s in zip(paths_a, scales)])
    b = np.stack([read_image_linear(p) * s for p, s in zip(paths_b, scales)])
    r = np.stack([read_image_linear(p) * s
                  for p, s in zip(paths_ref, scales)])
    return (a.astype(np.float32), b.astype(np.float32), r.astype(np.float32))


@functools.partial(jax.jit, static_argnames=("batch", "crop", "rgb", "n2n_p"))
def sample_batch(data_a: jax.Array, data_b: jax.Array, data_ref: jax.Array,
                 key: jax.Array, batch: int, crop: int, rgb: bool,
                 n2n_p: float = 0.0):
    """Draw one (inputs, targets) batch on device.

    data_*: (N, H, W, 3) stage tensors resident in HBM.
    Returns (batch, crop, crop, 3) when rgb else (batch, crop, crop, 1).
    """
    n, h, w, _ = data_a.shape
    ks = jax.random.split(key, 7)
    idx = jax.random.randint(ks[0], (batch,), 0, n)
    top = jax.random.randint(ks[1], (batch,), 0, h - crop + 1)
    left = jax.random.randint(ks[2], (batch,), 0, w - crop + 1)
    rot = jax.random.randint(ks[3], (batch,), 0, 4)
    swap = jax.random.bernoulli(ks[4], 0.5, (batch,))
    use_n2n = jax.random.bernoulli(ks[5], n2n_p, (batch,))
    chan = jax.random.randint(ks[6], (batch,), 0, 3)

    def one(i, t, l, r_k, sw, nn):
        a = jax.lax.dynamic_slice(data_a[i], (t, l, 0), (crop, crop, 3))
        b = jax.lax.dynamic_slice(data_b[i], (t, l, 0), (crop, crop, 3))
        ref = jax.lax.dynamic_slice(data_ref[i], (t, l, 0), (crop, crop, 3))
        inp = jnp.where(sw, b, a)
        other = jnp.where(sw, a, b)
        tgt = jnp.where(nn, other, ref)
        rot4 = lambda x: jax.lax.switch(
            r_k, [lambda v: v, lambda v: jnp.rot90(v, 1),
                  lambda v: jnp.rot90(v, 2), lambda v: jnp.rot90(v, 3)], x)
        return rot4(inp), rot4(tgt)

    inp, tgt = jax.vmap(one)(idx, top, left, rot, swap, use_n2n)
    if not rgb:
        # Same random channel for input and target per item.
        take = jax.vmap(lambda x, c: x[..., c])
        inp = take(inp, chan)[..., None]
        tgt = take(tgt, chan)[..., None]
    return inp, tgt


@functools.partial(jax.jit, static_argnames=("batch", "crop", "rgb",
                                              "identity_p"))
def sample_batch_pair(data_a: jax.Array, data_b: jax.Array,
                      data_ref: jax.Array, key: jax.Array, batch: int,
                      crop: int, rgb: bool, identity_p: float = 0.0):
    """Draw one (a, b, ref) TRIPLET batch on device — both tracers of the
    same crop plus the converged reference, for composition-in-the-loss
    training (Trainer.train_batch_pair_async): the loss is evaluated on
    the PRODUCTION display x + k*dbar, which needs both tracers.
    Augmentations (crop, 90-degree rotation, tracer swap) apply to the
    whole triplet; channel select picks the same channel for all three
    when rgb=False.

    identity_p: probability an item presents the CONVERGED reference as
    both tracers (a = b = ref). The corpus never otherwise shows a clean
    input, so nets hallucinated on fully-converged scenes (r5 measured:
    one held-out converged scene at raw -73 dB while every noisy scene
    was +1.4..+6 dB). The pair composition is inert on these items
    (b - a = 0 -> k = 0 -> display = ref); the RAW loss term is what
    teaches net(clean) = clean."""
    n, h, w, _ = data_a.shape
    ks = jax.random.split(key, 7)
    idx = jax.random.randint(ks[0], (batch,), 0, n)
    top = jax.random.randint(ks[1], (batch,), 0, h - crop + 1)
    left = jax.random.randint(ks[2], (batch,), 0, w - crop + 1)
    rot = jax.random.randint(ks[3], (batch,), 0, 4)
    swap = jax.random.bernoulli(ks[4], 0.5, (batch,))
    chan = jax.random.randint(ks[5], (batch,), 0, 3)
    ident = jax.random.bernoulli(ks[6], identity_p, (batch,))

    def one(i, t, l, r_k, sw, idn):
        a = jax.lax.dynamic_slice(data_a[i], (t, l, 0), (crop, crop, 3))
        b = jax.lax.dynamic_slice(data_b[i], (t, l, 0), (crop, crop, 3))
        ref = jax.lax.dynamic_slice(data_ref[i], (t, l, 0), (crop, crop, 3))
        a, b = jnp.where(sw, b, a), jnp.where(sw, a, b)
        a = jnp.where(idn, ref, a)
        b = jnp.where(idn, ref, b)
        rot4 = lambda x: jax.lax.switch(
            r_k, [lambda v: v, lambda v: jnp.rot90(v, 1),
                  lambda v: jnp.rot90(v, 2), lambda v: jnp.rot90(v, 3)], x)
        return rot4(a), rot4(b), rot4(ref)

    a, b, ref = jax.vmap(one)(idx, top, left, rot, swap, ident)
    if not rgb:
        take = jax.vmap(lambda x, c: x[..., c])
        a = take(a, chan)[..., None]
        b = take(b, chan)[..., None]
        ref = take(ref, chan)[..., None]
    return a, b, ref


class DeviceStages:
    """Stage tensors resident on device + a fused sample-and-train driver."""

    def __init__(self, stages: dict[str, tuple]):
        """stages: name -> (a, b, ref) numpy arrays from stack_stage."""
        self.data = {name: tuple(jnp.asarray(x) for x in arrs)
                     for name, arrs in stages.items()}

    def sample(self, name: str, key, batch: int, crop: int, rgb: bool,
               n2n_p: float = 0.0):
        a, b, r = self.data[name]
        return sample_batch(a, b, r, key, batch, crop, rgb, n2n_p)

    def sample_pair(self, name: str, key, batch: int, crop: int, rgb: bool,
                    identity_p: float = 0.0):
        a, b, r = self.data[name]
        return sample_batch_pair(a, b, r, key, batch, crop, rgb,
                                 identity_p)
