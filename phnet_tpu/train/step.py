"""One jitted training step.

Replaces the reference's DDP iteration (``trainVIL.py:204-265``): forward
over the clip, criterion, backward, AdamW update. Differences by design:

* gradient all-reduce is implicit — the batch (clips) is sharded over the
  mesh ``data`` axis and XLA inserts the psum over ICI (no NCCL calls);
* no GradScaler: bf16 on TPU needs no loss scaling (``trainVIL.py:249-251``);
* ``find_unused_parameters=True`` has no analogue: both branches always
  contribute (masked), so every parameter gets a (possibly zero) gradient;
* BatchNorm statistics are computed over the global sharded batch =
  SyncBatchNorm (``trainVIL.py:156``).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax

from ..losses.criterion import LaneCriterion
from .state import TrainState


def make_train_step(
    model, criterion: LaneCriterion, tx: optax.GradientTransformation
) -> Callable:
    def train_step(state: TrainState, frames, labels, rng) -> Tuple[TrainState, dict]:
        """frames: [B, T, H, W, 3]; labels: [B, T, L, dim]."""

        def loss_fn(params):
            (outs, _mem), updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                frames, labels, train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            loss, metrics = criterion(outs, labels)
            return loss, (metrics, updates)

        (loss, (metrics, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        upd, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, upd)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=updates.get("batch_stats", state.batch_stats),
            opt_state=opt_state,
        )
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step
