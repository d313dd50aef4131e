"""Device mesh + sharding rules.

The reference's only systems parallelism is 4-GPU NCCL data-parallel DDP
(``trainVIL.py:28-29, 156-161``; SURVEY.md section 2.8). TPU-native
equivalent: one ``jax.sharding.Mesh`` with a ``data`` axis (clips sharded,
gradients psum'ed over ICI by GSPMD) and an optional ``model`` axis for
tensor-parallel sharding of the head's fat dense kernels (the DynamicConv
weight-generator MLPs and decoder FFN dominate head FLOPs/params).

There is no pipeline or expert axis in this architecture (3-stage head is
sequentially dependent; no MoE); the model axis is the meaningful second
dimension, and sequence (time) cannot shard because frame t consumes memory
written by frame t-1.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (clip batch) axis over `data`."""
    return NamedSharding(mesh, P("data"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# -- tensor-parallel parameter placement -----------------------------------
TP_MIN_SIZE = 1 << 16  # only shard kernels with >= 64k elements by default


def _param_spec(path: str, p, model_size: int, min_size: int) -> P:
    if model_size <= 1 or p.ndim < 2 or p.size < min_size:
        return P()
    # shard the output dim of fat dense kernels (DynamicConv generators,
    # decoder FFN, router MLPs); XLA inserts the all-gathers/reduces.
    if p.shape[-1] % model_size == 0:
        return P(*([None] * (p.ndim - 1) + ["model"]))
    if p.shape[0] % model_size == 0:
        return P(*(["model"] + [None] * (p.ndim - 1)))
    return P()


def shard_params(params: Any, mesh: Mesh, min_size: int = TP_MIN_SIZE) -> Any:
    """NamedSharding tree for the parameter pytree: replicate small params,
    tensor-shard fat kernels over the `model` axis."""
    model_size = mesh.shape.get("model", 1)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def spec_for(path, p):
        name = jax.tree_util.keystr(path)
        return NamedSharding(mesh, _param_spec(name, p, model_size, min_size))

    specs = {jax.tree_util.keystr(path): spec_for(path, p) for path, p in flat}

    def map_fn(path, p):
        return specs[jax.tree_util.keystr(path)]

    return jax.tree_util.tree_map_with_path(map_fn, params)
