"""Sharded denoiser training step over a device mesh.

Mesh axes:
  data  — batch data parallelism (gradients all-reduced by GSPMD)
  model — tensor parallelism: the UNet's widest conv kernels (bottleneck and
          deep encoder/decoder blocks) are sharded along their output-channel
          dimension; XLA GSPMD inserts the all-gathers/reduce-scatters.

The reference has no distributed training (single GPU PyTorch,
SURVEY.md section 2.8); this is the TPU-native scaling design for the
production-size model (unet_size=5 -> 2048-channel bottleneck, ~300M params
where channel sharding genuinely matters).

BatchNorm under data parallelism: this is GSPMD `jit` (single logical
program with sharded operands), NOT per-device `pmap` replicas — the BN
batch means/variances are reductions over the FULL logical batch, for which
XLA inserts the cross-device all-reduces automatically. There is no
per-shard statistics drift to sync by hand (the pmap-era `pmean` idiom);
tests/test_parallel.py::test_sharded_train_bn_stats_are_global proves the
running stats match a single-device step bit-for-bit-tolerance on the same
global batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..nn.loss import HdrLossConfig, hdr_loss
from ..nn.unet import LitboxDenoiserNet

MODEL_SHARD_MIN_CHANNELS = 256  # shard conv kernels with >= this many out-channels


def make_train_mesh(n_devices: int | None = None, model_parallel: int = 2) -> Mesh:
    import numpy as np

    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    if n % model_parallel:
        model_parallel = 1
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def param_shardings(params, mesh: Mesh):
    """Channel-shard large conv kernels over 'model'; replicate the rest."""

    def spec_for(path, leaf):
        is_kernel = path and path[-1].key == "kernel"
        if (is_kernel and leaf.ndim == 4
                and leaf.shape[-1] >= MODEL_SHARD_MIN_CHANNELS
                and leaf.shape[-1] % mesh.shape["model"] == 0):
            return NamedSharding(mesh, P(None, None, None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def build_sharded_train_step(mesh: Mesh, unet_size: int = 5,
                             initial_features: int = 32,
                             learn_rate: float = 1e-5, weight_decay: float = 0.01,
                             crop: int = 64, batch: int = 4):
    """Returns (step_fn, params, batch_stats, opt_state) with device placement.

    step_fn(params, batch_stats, opt_state, inputs, targets) is jitted over
    the mesh: inputs/targets sharded (data, None, None, None), heavy conv
    kernels sharded over 'model', everything else replicated.
    """
    model = LitboxDenoiserNet(unet_size=unet_size, initial_features=initial_features)
    variables = model.init(jax.random.key(0), jnp.zeros((1, crop, crop, 1)), train=False)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    tx = optax.chain(optax.add_decayed_weights(weight_decay), optax.adam(learn_rate))
    opt_state = tx.init(params)

    p_shard = param_shardings(params, mesh)
    replicated = NamedSharding(mesh, P())
    data_shard = NamedSharding(mesh, P("data", None, None, None))

    params = jax.device_put(params, p_shard)
    batch_stats = jax.device_put(batch_stats, jax.tree_util.tree_map(
        lambda _: replicated, batch_stats))
    opt_state = jax.device_put(opt_state, jax.tree_util.tree_map(
        lambda _: replicated, opt_state, is_leaf=lambda x: isinstance(x, jax.Array)))

    loss_cfg = HdrLossConfig()

    @jax.jit
    def step(params, batch_stats, opt_state, inputs, targets):
        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, inputs, train=True,
                mutable=["batch_stats"])
            return hdr_loss(out, targets, loss_cfg), updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    def run(params, batch_stats, opt_state, inputs, targets):
        inputs = jax.device_put(inputs, data_shard)
        targets = jax.device_put(targets, data_shard)
        return step(params, batch_stats, opt_state, inputs, targets)

    return run, params, batch_stats, opt_state
