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


def fused_adamw(
    schedule: optax.Schedule,
    b1: float,
    b2: float,
    weight_decay: float,
    lr_scales: Any = None,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """``optax.adamw(mask=decay_mask)`` computed on ONE flat vector.

    Identical elementwise math (scale_by_adam -> add_decayed_weights ->
    -lr; trajectory-parity-tested against torch AdamW like the optax
    path), but the whole update is ~10 wide vector ops instead of ~8
    tiny fusions PER PARAMETER LEAF: the round-5 B=4 train trace showed
    ~1550 sub-40us f32[C]-shaped top-level ops per step (~31 ms, ~10% of
    the step) that are exactly this per-leaf update soup — a dispatch/
    latency cost the reference never sees only because its optimizer
    runs on the host. The decay mask (ndim > 1) and optional per-layer
    LR scales fold into constant flat vectors that XLA bakes into the
    compiled step.
    """
    import jax

    # The flat space is an EXPLICIT [m, 1024] matrix, never an odd-sized
    # 1-D buffer: XLA tiles a big 1-D f32 vector by factoring its length,
    # and for the 83,486,697-parameter count here it measurably picks
    # [n/3, 3] (3 of 128 lanes, ~23 ms/step of layout copies) — and for
    # a 128-aligned length, [n/2, 2], whose T(8,128) tiling tried to
    # allocate 21 GB at compile. The per-leaf reshapes below are
    # bitcasts (leaves are contiguous), the concat lands directly in the
    # [m, 1024] layout, and the unflatten slices each leaf straight out
    # of the even-sized flat view.
    _ALIGN = 1024

    def _flatten(tree):
        # EVERY leaf is padded to a 1024 multiple and reshaped to
        # [rows, 1024] BEFORE the concat, so all concat offsets are
        # row-aligned — unaligned piece offsets are what drove the TPU
        # backend to synthesize the pathological flat reshape
        parts = []
        for x in jax.tree.leaves(tree):
            v = jnp.ravel(x)
            rem = (-v.shape[0]) % _ALIGN
            if rem:
                v = jnp.pad(v, (0, rem))
            parts.append(v.reshape(-1, _ALIGN))
        return jnp.concatenate(parts, axis=0)

    def _unflatten(template, v2d):
        leaves, off = [], 0
        for ref in jax.tree.leaves(template):
            rows = (ref.size + _ALIGN - 1) // _ALIGN
            blk = jax.lax.slice(v2d, (off, 0), (off + rows, _ALIGN))
            leaves.append(
                blk.reshape(-1)[: ref.size].reshape(ref.shape))
            off += rows
        return jax.tree.unflatten(jax.tree.structure(template), leaves)

    def init_fn(params):
        zeros = _flatten(jax.tree.map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params))
        state = {
            "count": jnp.zeros((), jnp.int32),
            "grad_norm": jnp.zeros((), jnp.float32),
            "mu": zeros,
            "nu": jnp.zeros_like(zeros),
            # constants live in the state so they are built ONCE at init
            # (in-graph per-step rebuilds of the 150-leaf concat neither
            # fold nor fuse — measured as full extra passes); bool, not
            # f32 — this matrix is device-resident for the whole run AND
            # checkpointed with the opt_state (f32 would add ~334 MB to
            # both for an 83.5M-param model)
            "mask": _flatten(jax.tree.map(
                lambda p: jnp.full(p.shape, p.ndim > 1, bool), params)),
        }
        if lr_scales is not None:
            state["scales"] = _flatten(jax.tree.map(
                lambda p, s: jnp.full(p.shape, s, jnp.float32),
                params, lr_scales))
        return state

    def update_fn(updates, state, params=None):
        assert params is not None
        g = _flatten(updates)
        p = _flatten(params)
        count = state["count"] + 1
        mu = state["mu"] * b1 + g * (1.0 - b1)
        nu = state["nu"] * b2 + (g * g) * (1.0 - b2)
        # global grad norm as ONE fused reduce over the flat matrix —
        # train/step.py logs it every step, and the per-leaf
        # optax.global_norm alternative is ~150 tiny scalar reduces
        # (part of the measured top-level tiny-op soup)
        grad_norm = jnp.sqrt(jnp.sum(g * g))
        c = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - b1**c)
        nu_hat = nu / (1.0 - b2**c)
        upd = mu_hat / (jnp.sqrt(nu_hat) + eps)
        upd = upd + weight_decay * state["mask"].astype(jnp.float32) * p
        upd = upd * (-schedule(state["count"]))
        if "scales" in state:
            upd = upd * state["scales"]
        new_state = dict(state, count=count, mu=mu, nu=nu,
                         grad_norm=grad_norm)
        return _unflatten(updates, upd), new_state

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(
    cfg: TrainConfig, total_steps: int, params: Any = None,
    lr_scales: Any = None,
) -> optax.GradientTransformation:
    schedule = cosine_schedule(cfg.learning_rate, max(total_steps, 1))
    if cfg.solver == "adamw":
        if cfg.fused_optimizer:
            tx = fused_adamw(
                schedule,
                b1=cfg.momentum[0],
                b2=cfg.momentum[1],
                weight_decay=cfg.weight_decay,
                lr_scales=lr_scales,
            )
            if cfg.grad_clip_norm > 0:
                tx = optax.chain(
                    optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
            return tx
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
