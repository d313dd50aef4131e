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


def revcol_layer_scales(
    params: Any,
    layers=(2, 2, 4, 2),
    num_subnet: int = 4,
    layer_decay: float = 0.9,
) -> Any:
    """Per-parameter LR scales for the RevCol backbone.

    Reference ``libs/utils/optimizer.py:77-143`` (``param_groups_lrd`` +
    ``cal_model_depth``/``get_layer_id``): a dynamic-programming depth table
    over (block depth x columns) assigns each subnet/level/block a layer id;
    scale = layer_decay ** (num_layers - id). Non-backbone parameters get
    id = num_layers (scale = 1 at the head).
    """
    import numpy as np

    depth = sum(layers)
    dp = np.zeros((depth, num_subnet), dtype=int)
    dp[:, 0] = np.arange(depth)
    dp[0, :] = np.arange(num_subnet)
    for i in range(1, depth):
        for j in range(1, num_subnet):
            dp[i][j] = min(dp[i][j - 1], dp[i - 1][j]) + 1
    dp = dp + 1
    num_layers = dp[-1][-1] + 1
    scales = [layer_decay ** (num_layers - i) for i in range(num_layers + 1)]

    def layer_id(path_str: str) -> int:
        import re

        if "backbone" not in path_str:
            return num_layers  # head/neck: scale = layer_decay^0 = 1
        if "stem" in path_str:
            return 0
        m = re.search(r"subnet(\d+)", path_str)
        if not m:
            return num_layers
        col = int(m.group(1))
        if "alpha" in path_str:
            return int(dp[0][col])
        lm = re.search(r"level(\d+)", path_str)
        if lm is None:
            return int(dp[0][col])
        lvl = int(lm.group(1))
        bm = re.search(r"block(\d+)", path_str)
        sub = min(int(bm.group(1)), layers[lvl] - 1) if bm else 0
        block = sum(layers[:lvl]) + sub
        return int(dp[block][col])

    def map_fn(path, p):
        pid = layer_id(jax.tree_util.keystr(path))
        return scales[min(pid, num_layers)]

    import jax

    return jax.tree_util.tree_map_with_path(map_fn, params)


def scale_updates_by_tree(scales: Any) -> optax.GradientTransformation:
    """Multiply each parameter's update by a fixed scalar (per-layer LR)."""
    import jax

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return jax.tree.map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(
    cfg: TrainConfig, total_steps: int, params: Any = None,
    lr_scales: Any = None,
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
    if lr_scales is not None:
        tx = optax.chain(tx, scale_updates_by_tree(lr_scales))
    if cfg.grad_clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    return tx
