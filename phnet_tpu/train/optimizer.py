"""Optimizer builder (optax).

Equivalent of the reference's ``libs/utils/optimizer.py:11-55``: AdamW or
Nesterov SGD with normalization/bias parameters exempt from weight decay
(``set_weight_decay``: any 1-D parameter gets no decay), plus the cosine
schedule stepped per iteration with ``T_max = steps_total / world_size``
(``trainVIL.py:117, 253``).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import optax

from ..config import TrainConfig


def decay_mask(params: Any) -> Any:
    """True for parameters that receive weight decay: ndim > 1 (conv/dense
    kernels); 1-D params (biases, norm scales) are exempt."""
    import jax

    return jax.tree.map(lambda p: p.ndim > 1, params)


def cosine_schedule(lr: float, total_steps: int) -> optax.Schedule:
    """torch ``CosineAnnealingLR`` with eta_min=0:
    lr_t = lr * (1 + cos(pi * t / T_max)) / 2."""

    def schedule(step):
        t = jnp.minimum(step, total_steps).astype(jnp.float32)
        return lr * 0.5 * (1.0 + jnp.cos(jnp.pi * t / total_steps))

    return schedule


def build_optimizer(
    cfg: TrainConfig, total_steps: int, params: Any = None
) -> optax.GradientTransformation:
    schedule = cosine_schedule(cfg.learning_rate, max(total_steps, 1))
    if cfg.solver == "adamw":
        tx = optax.adamw(
            learning_rate=schedule,
            b1=cfg.momentum[0],
            b2=cfg.momentum[1],
            weight_decay=cfg.weight_decay,
            mask=decay_mask,
        )
    elif cfg.solver == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay, mask=decay_mask),
            optax.sgd(learning_rate=schedule, momentum=cfg.momentum[0],
                      nesterov=True),
        )
    else:
        raise ValueError(f"unknown solver {cfg.solver}")
    if cfg.grad_clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    return tx
