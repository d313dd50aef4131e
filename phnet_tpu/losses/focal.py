"""Softmax focal loss (kornia-style, reference ``libs/utils/focal_loss.py``).

``loss_a = -sum_c onehot_c * alpha_c * (1 - p_c)^gamma * log(p_c)`` with
softmax probabilities; reduction 'none' returns the per-anchor vector the
router-blended criterion needs (``lossV5.py:118-124``).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def softmax_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: Sequence[float] = (0.5, 0.5),
    gamma: float = 2.0,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """logits: [..., A, C]; targets: [..., A] int -> [..., A] loss vector."""
    probs = jax.nn.softmax(logits, axis=-1) + eps
    n_cls = logits.shape[-1]
    # the reference adds eps to the one-hot itself (focal_loss.py:70-75,
    # ``one_hot.scatter_(...) + eps``), leaking eps*sum_c(focal_c) into the
    # loss — reproduced for numeric parity
    one_hot = jax.nn.one_hot(targets, n_cls, dtype=logits.dtype) + eps
    alpha_v = jnp.asarray(alpha, dtype=logits.dtype)
    focal = -alpha_v * (1.0 - probs) ** gamma * jnp.log(probs)
    return jnp.sum(one_hot * focal, axis=-1)
