"""Denoiser training loop (reference: train_litbox_denoiser.py).

Curriculum stages over input sets, Adam with torch-style (coupled) weight
decay 0.01 and lr 1e-5 (train_litbox_denoiser.py:183-186), per-batch random
channel selection (the declared intent of :102-113,231-237 — the reference
file's version has live bugs there which are not replicated), HdrLoss, and
wall-clock checkpointing every `checkpoint_interval` seconds with golden
evaluation (:256-268).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from .dataset import DenoiserDataset
from .loss import HdrLossConfig, hdr_loss
from .unet import LitboxDenoiserNet, TransformConfig, post_transform, pre_transform


@dataclasses.dataclass
class TrainConfig:
    unet_size: int = 5
    initial_features: int = 32
    padding_mode: str = "reflect"
    use_sigmoid: bool = False
    global_residual: bool = False
    learn_rate: float = 1e-5
    # Optional cosine decay: learn_rate -> lr_min over lr_decay_steps, then
    # flat at lr_min (0 = constant lr, the reference behavior). Short-budget
    # training (hours, not the reference's days at 1e-5) needs a hot start
    # and a cool tail to settle BN statistics.
    lr_decay_steps: int = 0
    lr_min: float = 1e-6
    warmup_steps: int = 0
    weight_decay: float = 0.01
    grad_clip: float = 1.0
    batch_size: int = 4
    epochs: int = 20
    crop_size: int = 256
    checkpoint_interval: float = 900.0
    loss: HdrLossConfig = dataclasses.field(default_factory=HdrLossConfig)
    transform: TransformConfig = dataclasses.field(default_factory=TransformConfig)
    seed: int = 0
    # Train the 3-channel RGB variant (unet.LitboxDenoiserNet.out_channels):
    # the realtime display net — one pass per frame instead of three.
    rgb: bool = False
    # Composition-in-the-loss (round 5, VERDICT r4 next #3): optimize the
    # PRODUCTION display x + k*(d_a+d_b)/2 — with k the same per-crop
    # cross-projection blend_pair_symmetric ships — against the reference,
    # plus raw_loss_weight times the raw pair-mean output loss so the net
    # keeps improving where k gates it out. k is STOP-GRADIENTED per step
    # (EM-style; a differentiable k let the net game the estimator —
    # measured in _build_pair_step's comment).
    pair_composition: bool = False
    raw_loss_weight: float = 0.5


def load_train_config(checkpoint_path: str) -> TrainConfig:
    """Reconstruct the TrainConfig saved next to a checkpoint (the .json
    Trainer.save writes) so eval/inference always matches the transform and
    architecture the model was trained with."""
    path = checkpoint_path
    if not path.endswith(".json"):
        path = (path if path.endswith(".npz") else path + ".npz") + ".json"
    with open(path) as f:
        d = json.load(f)
    d["loss"] = HdrLossConfig(**d.get("loss", {}))
    t = d.get("transform", {})
    d["transform"] = TransformConfig(**{k: v for k, v in t.items()})
    return TrainConfig(**d)


class Trainer:
    def __init__(self, cfg: TrainConfig):
        self.cfg = cfg
        self.model = LitboxDenoiserNet(
            unet_size=cfg.unet_size, initial_features=cfg.initial_features,
            padding_mode=cfg.padding_mode, use_sigmoid=cfg.use_sigmoid,
            global_residual=cfg.global_residual,
            out_channels=3 if cfg.rgb else 1)
        key = jax.random.key(cfg.seed)
        dummy = jnp.zeros((1, cfg.crop_size, cfg.crop_size,
                           3 if cfg.rgb else 1))
        variables = self.model.init(key, dummy, train=False)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        # torch Adam(weight_decay=) couples the decay into the gradient
        # (not AdamW): add_decayed_weights BEFORE the adam transform. The
        # global-norm clip guards the HDR-weighted L2 loss, whose gradient
        # scale follows the scene's (unbounded) radiance range.
        if cfg.lr_decay_steps:
            lr = optax.warmup_cosine_decay_schedule(
                init_value=cfg.learn_rate * 0.1 if cfg.warmup_steps else cfg.learn_rate,
                peak_value=cfg.learn_rate, warmup_steps=cfg.warmup_steps,
                decay_steps=cfg.lr_decay_steps, end_value=cfg.lr_min)
        else:
            lr = cfg.learn_rate
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip) if cfg.grad_clip else optax.identity(),
            optax.add_decayed_weights(cfg.weight_decay),
            optax.adam(lr),
        )
        self.opt_state = self.tx.init(self.params)
        self._step = self._build_step()
        self._pair_step = self._build_pair_step() if cfg.pair_composition else None
        self.global_step = 0

    def _build_step(self):
        model, cfg, tx = self.model, self.cfg, self.tx

        @jax.jit
        def step(params, batch_stats, opt_state, inputs, targets):
            def loss_fn(p):
                x, stats = pre_transform(inputs, cfg.transform)
                out, updates = model.apply(
                    {"params": p, "batch_stats": batch_stats}, x, train=True,
                    mutable=["batch_stats"])
                pred = post_transform(out, stats, cfg.transform)
                return hdr_loss(pred, targets, cfg.loss), updates["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_stats, opt_state, loss

        return step

    def _build_pair_step(self):
        """Gradient step on the PRODUCTION composition (TrainConfig
        .pair_composition): both tracers denoise in one batched apply, the
        displayed image is x + k*dbar with the per-crop cross-projection k
        of nn.infer.blend_pair_symmetric, and the loss scores that display
        (plus raw_loss_weight * the raw pair-mean output) against the
        reference. Training and inference now optimize/serve the SAME
        estimator end-to-end (VERDICT r4 next #3; reference analog: the
        net IS the display path, AIAccelerator.cs:57-84)."""
        model, cfg, tx = self.model, self.cfg, self.tx

        @jax.jit
        def step(params, batch_stats, opt_state, a, b, ref):
            def loss_fn(p):
                nb = a.shape[0]
                xab = jnp.concatenate([a, b], axis=0)
                xin, stats = pre_transform(xab, cfg.transform)
                out, updates = model.apply(
                    {"params": p, "batch_stats": batch_stats}, xin,
                    train=True, mutable=["batch_stats"])
                pred = post_transform(out, stats, cfg.transform)
                out_a, out_b = pred[:nb], pred[nb:]
                d_a, d_b = out_a - a, out_b - b
                dbar = (d_a + d_b) * 0.5
                x = (a + b) * 0.5
                axes = tuple(range(1, a.ndim))
                num = ((d_a - d_b) * (b - a)).sum(axes) * 0.25
                den = (dbar * dbar).sum(axes)
                k = jnp.clip(num / jnp.maximum(den, 1e-12), 0.0, 1.0)
                # STOP-GRADIENT through k (r5 measured finding): with k
                # differentiable the net games the estimator — 10 minutes
                # of fine-tuning dropped held-out production gain from
                # +1.21 to +0.33 dB while raw output blew up to -22 dB
                # (runs/train_r5.log first launches). With k frozen per
                # step the net optimizes the display UNDER the current
                # calibration and k adapts across steps (EM-style); the
                # raw term keeps the net anchored where k gates it out.
                k = jax.lax.stop_gradient(k)
                disp = x + k.reshape((-1,) + (1,) * (a.ndim - 1)) * dbar
                loss = hdr_loss(disp, ref, cfg.loss)
                if cfg.raw_loss_weight:
                    loss = loss + cfg.raw_loss_weight * hdr_loss(
                        (out_a + out_b) * 0.5, ref, cfg.loss)
                return loss, updates["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_stats, opt_state, loss

        return step

    def train_batch_pair_async(self, a, b, ref):
        """Composition-in-the-loss step (pair_composition=True); returns
        the DEVICE loss array like train_batch_async."""
        self.params, self.batch_stats, self.opt_state, loss = self._pair_step(
            self.params, self.batch_stats, self.opt_state, a, b, ref)
        self.global_step += 1
        return loss

    @staticmethod
    def select_random_channel(batch: dict, rng: np.random.Generator):
        """Same random channel for input and target per item
        (train_litbox_denoiser.py:102-113)."""
        n = batch["input_a"].shape[0]
        c = rng.integers(0, 3, n)
        idx = np.arange(n)
        inputs = batch["input_a"][idx, :, :, c][..., None]
        targets = batch["reference"][idx, :, :, c][..., None]
        return jnp.asarray(inputs), jnp.asarray(targets)

    def train_batch(self, inputs, targets) -> float:
        self.params, self.batch_stats, self.opt_state, loss = self._step(
            self.params, self.batch_stats, self.opt_state, inputs, targets)
        self.global_step += 1
        return float(loss)

    def train_batch_async(self, inputs, targets):
        """train_batch without the host sync: returns the DEVICE loss array.

        float(loss) blocks on a ~30 ms tunnel round-trip per step in this
        environment; the async variant lets dispatches queue back-to-back
        (fetch the loss every N steps for logging instead). Feed it device
        arrays (nn.device_data) and the whole step loop runs without host
        traffic."""
        self.params, self.batch_stats, self.opt_state, loss = self._step(
            self.params, self.batch_stats, self.opt_state, inputs, targets)
        self.global_step += 1
        return loss

    def fit(self, curriculum: list[tuple[str, DenoiserDataset]],
            checkpoint_folder: str | None = None,
            on_checkpoint: Callable[[str], None] | None = None,
            log_every: float = 10.0, max_steps: int | None = None) -> list[dict]:
        """Run the full curriculum; returns the loss log
        (CSV-ish stdout parity: train_litbox_denoiser.py:248-251)."""
        rng = np.random.default_rng(self.cfg.seed)
        start = time.time()
        last_print = start
        last_checkpoint = start
        log = []
        for name, dataset in curriculum:
            for epoch in range(self.cfg.epochs):
                # Reference DataLoader semantics shuffle every epoch; without
                # it batch composition is identical across epochs and only
                # the crop/rotation augmentation varies.
                for batch in dataset.batches(self.cfg.batch_size, rng, shuffle=True):
                    if self.cfg.rgb:
                        inputs = jnp.asarray(batch["input_a"])
                        targets = jnp.asarray(batch["reference"])
                    else:
                        inputs, targets = self.select_random_channel(batch, rng)
                    loss = self.train_batch(inputs, targets)
                    now = time.time()
                    if now - last_print >= log_every:
                        entry = dict(elapsed=now - start, curriculum=name,
                                     epoch=epoch, step=self.global_step, loss=loss)
                        print("{elapsed:.2f},{curriculum},{epoch},{step},{loss:.6f}".format(**entry))
                        log.append(entry)
                        last_print = now
                    if (checkpoint_folder
                            and now - last_checkpoint >= self.cfg.checkpoint_interval):
                        cdir = os.path.join(checkpoint_folder, str(int(now - start)))
                        self.save(os.path.join(cdir, "model.msgpack"))
                        if on_checkpoint:
                            on_checkpoint(cdir)
                        last_checkpoint = time.time()
                    if max_steps is not None and self.global_step >= max_steps:
                        return log
        return log

    # ----- checkpointing (reference: torch.save / .pth) -----
    # npz with flattened key paths: flax msgpack took minutes at GB scale.

    def _flat(self, tree, prefix):
        leaves = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            key = prefix + "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                                    for p in path)
            leaves[key] = np.asarray(leaf)
        return leaves

    def save(self, path: str, include_optimizer: bool = True):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        arrays = self._flat(self.params, "params:")
        arrays.update(self._flat(self.batch_stats, "stats:"))
        if include_optimizer:
            arrays.update(self._flat(self.opt_state, "opt:"))
        np.savez(path, **arrays)
        with open(path + ".json", "w") as f:
            json.dump(dataclasses.asdict(self.cfg), f, default=str)

    def _unflat(self, tree, arrays, prefix):
        paths, treedef = jax.tree_util.tree_flatten_with_path(tree)
        leaves = []
        for path, leaf in paths:
            key = prefix + "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                                    for p in path)
            leaves.append(jnp.asarray(arrays[key]) if key in arrays else leaf)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    def load(self, path: str):
        if not path.endswith(".npz") and os.path.exists(path + ".npz"):
            path = path + ".npz"
        arrays = np.load(path)
        self.params = self._unflat(self.params, arrays, "params:")
        self.batch_stats = self._unflat(self.batch_stats, arrays, "stats:")
        if any(k.startswith("opt:") for k in arrays.files):
            self.opt_state = self._unflat(self.opt_state, arrays, "opt:")

    def eval_fn(self) -> Callable[[Any], Any]:
        """Jitted single-channel forward in eval mode."""
        model, cfg = self.model, self.cfg

        @jax.jit
        def run(params, batch_stats, x):
            xin, stats = pre_transform(x, cfg.transform)
            out = model.apply({"params": params, "batch_stats": batch_stats},
                              xin, train=False)
            return post_transform(out, stats, cfg.transform)

        return lambda x: run(self.params, self.batch_stats, x)
