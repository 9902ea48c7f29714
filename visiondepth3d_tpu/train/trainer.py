"""Depth model fine-tuning: scale-shift-invariant loss + sharded train step.

The reference has no training capability; this framework adds it the TPU
way: one jitted ``train_step`` over a (dp, sp, tp) mesh — batch rows sharded
over ``dp``, transformer kernels Megatron-sharded over ``tp``
(parallel/tp.py), XLA inserting the gradient psums over ICI.

Loss: the MiDaS scale-and-shift-invariant MSE (per-image closed-form (s, t)
alignment of the prediction to the target disparity) plus a multi-scale
gradient-matching term — the standard relative-depth objective family the
Depth Anything line trains with.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..depth.configs import DPTConfig
from ..depth.dpt import DepthAnything
from ..parallel.tp import shard_params


def ssi_align(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray):
    """Per-image least-squares (scale, shift) aligning pred to target.

    pred/target/mask: [B, H, W]. Returns aligned pred.
    """
    m = mask.astype(pred.dtype)
    n = jnp.maximum(jnp.sum(m, axis=(1, 2)), 1.0)
    sp = jnp.sum(pred * m, axis=(1, 2))
    st = jnp.sum(target * m, axis=(1, 2))
    spp = jnp.sum(pred * pred * m, axis=(1, 2))
    spt = jnp.sum(pred * target * m, axis=(1, 2))
    det = jnp.maximum(n * spp - sp * sp, 1e-6)
    scale = (n * spt - sp * st) / det
    shift = (st - scale * sp) / n
    return pred * scale[:, None, None] + shift[:, None, None]


def ssi_loss(pred, target, mask=None, grad_weight: float = 0.5,
             grad_scales: int = 4):
    """Scale-shift-invariant MSE + multi-scale gradient matching."""
    if mask is None:
        mask = jnp.ones_like(target)
    aligned = ssi_align(pred, target, mask)
    m = mask.astype(pred.dtype)
    n = jnp.maximum(jnp.sum(m, axis=(1, 2)), 1.0)
    data = jnp.sum(((aligned - target) ** 2) * m, axis=(1, 2)) / n

    reg = 0.0
    diff = aligned - target
    for s in range(grad_scales):
        step = 2**s
        d = diff[:, ::step, ::step]
        mm = m[:, ::step, ::step]
        gx = jnp.abs(d[:, :, 1:] - d[:, :, :-1]) * mm[:, :, 1:] * mm[:, :, :-1]
        gy = jnp.abs(d[:, 1:, :] - d[:, :-1, :]) * mm[:, 1:, :] * mm[:, :-1, :]
        cnt = jnp.maximum(jnp.sum(mm[:, ::1], axis=(1, 2)), 1.0)
        reg = reg + (jnp.sum(gx, axis=(1, 2)) + jnp.sum(gy, axis=(1, 2))) / cnt
    return jnp.mean(data + grad_weight * reg)


@dataclasses.dataclass
class Trainer:
    cfg: DPTConfig
    learning_rate: float = 1e-4
    weight_decay: float = 1e-2

    def __post_init__(self):
        self.model = DepthAnything(self.cfg)
        self.tx = optax.adamw(self.learning_rate, weight_decay=self.weight_decay)

    def init(self, rng, sample, mesh: Mesh | None = None):
        params = self.model.init(rng, sample)["params"]
        if mesh is not None:
            params = shard_params(params, mesh)
        opt_state = self.tx.init(params)
        return params, opt_state

    def make_train_step(self, mesh: Mesh | None = None):
        model, tx = self.model, self.tx

        def loss_fn(params, frames, targets):
            pred = model.apply({"params": params}, frames)
            return ssi_loss(pred, targets)

        def train_step(params, opt_state, frames, targets):
            if mesh is not None:
                batch_sh = NamedSharding(mesh, P("dp"))
                frames = jax.lax.with_sharding_constraint(frames, batch_sh)
                targets = jax.lax.with_sharding_constraint(targets, batch_sh)
            loss, grads = jax.value_and_grad(loss_fn)(params, frames, targets)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return jax.jit(train_step, donate_argnums=(0, 1))
