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
    model, criterion: LaneCriterion, tx: optax.GradientTransformation,
    accum_steps: int = 1,
) -> Callable:
    """``accum_steps > 1`` splits the clip batch into that many
    micro-batches, accumulates gradients over a ``lax.scan``, and applies
    ONE optimizer update on the average — reproducing the reference's
    4-process global batch (``trainVIL.py:96-103``: batch 1/GPU x 4 GPUs)
    on a single chip when its HBM or its saturation point (B=1 on v5e,
    ROADMAP) argues against a wider device batch. The criterion returns a
    batch-mean loss, so the micro-average equals the full-batch loss;
    only BatchNorm forward statistics see the micro-batch (they update
    sequentially through the scan carry, like sequential DDP steps)."""

    def grads_of(params, batch_stats, frames, labels, rng):
        def loss_fn(p):
            (outs, _mem), updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                frames, labels, train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            loss, metrics = criterion(outs, labels)
            return loss, (metrics, updates)

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    def apply_update(state, grads, batch_stats, loss, metrics):
        upd, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, upd)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
        )
        metrics = dict(metrics)
        metrics["loss"] = loss
        # fused_adamw computes the global norm as one fused reduce over
        # its flat gradient matrix; the per-leaf optax.global_norm costs
        # ~150 tiny scalar reduces per step (measured top-level soup)
        if isinstance(opt_state, dict) and "grad_norm" in opt_state:
            metrics["grad_norm"] = opt_state["grad_norm"]
        else:
            metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    def train_step(state: TrainState, frames, labels, rng) -> Tuple[TrainState, dict]:
        """frames: [B, T, H, W, 3]; labels: [B, T, L, dim]."""
        if accum_steps == 1:
            (loss, (metrics, updates)), grads = grads_of(
                state.params, state.batch_stats, frames, labels, rng)
            return apply_update(
                state, grads,
                updates.get("batch_stats", state.batch_stats), loss, metrics)

        b = frames.shape[0]
        if b % accum_steps:
            raise ValueError(
                f"batch {b} not divisible by accum_steps={accum_steps}")
        mb = b // accum_steps
        fr = frames.reshape(accum_steps, mb, *frames.shape[1:])
        lb = labels.reshape(accum_steps, mb, *labels.shape[1:])
        rngs = jax.random.split(rng, accum_steps)

        def micro(carry, xs):
            bs, gsum, lsum = carry
            f, l, r = xs
            (loss, (metrics, updates)), g = grads_of(
                state.params, bs, f, l, r)
            gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
            return (updates.get("batch_stats", bs), gsum, lsum + loss), metrics

        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (batch_stats, gsum, lsum), metrics_stack = jax.lax.scan(
            micro, (state.batch_stats, zeros, jnp.zeros(())), (fr, lb, rngs))
        grads = jax.tree_util.tree_map(lambda g: g / accum_steps, gsum)
        # criterion metrics are per-micro-batch MEANS (criterion.py:239);
        # equal micro-batch sizes make their average the full-batch mean
        metrics = jax.tree_util.tree_map(
            lambda m: m.mean(0), metrics_stack)
        return apply_update(
            state, grads, batch_stats, lsum / accum_steps, metrics)

    return train_step
