"""Training state container."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    min_loss: jnp.ndarray  # running minimum epoch loss (checkpoint policy)


def create_train_state(model, cfg, rng, sample_frames, sample_labels,
                       tx: optax.GradientTransformation) -> TrainState:
    variables = jax.jit(
        lambda r, f, l: model.init(r, f, l, train=True)
    )({"params": rng, "dropout": jax.random.fold_in(rng, 1)},
      sample_frames, sample_labels)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.int32(0),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        min_loss=jnp.float32(jnp.inf),
    )
