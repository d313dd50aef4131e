"""AOT deployment artifacts: serialize the jitted inference step.

Production serving should not need the model-building Python (flax module
tree, config dataclasses, weight init) on the serving host — the reference
ships ``.pth.tar`` checkpoints that still require the whole ``libs/``
package to run (``testVIL.py:41-61``). Here the deployable unit is the
*compiled program*: ``jax.export`` serializes the traced+lowered StableHLO
of the streaming inference step, and the artifact directory carries the
weights and the initial temporal-memory buffers alongside it:

    <dir>/
      step.jaxexport   serialized Exported (StableHLO + in/out treedefs)
      params.npz       flattened model variables ('/'-joined paths)
      memory.npz       initial memory arrays (ring buffer or V3 carry)
      manifest.json    shapes, lane-spec decode constants, jax version

``DeployedServer(dir)`` reconstructs a ticking server from those files
alone — no PHNet / flax import, no re-trace, no weight-init code path; the
XLA compile of the StableHLO payload is the only startup cost. The
exported step is platform-checked by jax.export (an artifact exported on
TPU refuses to run on CPU and vice versa), so export on the deployment
platform or pass ``platforms=('tpu', 'cpu')`` to cover both.

All pytree arguments cross the serialization boundary as plain
tuples/dicts of arrays (the memory NamedTuple is decomposed), so loading
never needs this package's pytree classes registered.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util
from jax import export as jax_export

from .config import ModelConfig
from .models import PHNet
from .models.phnet import init_memory

_MANIFEST = "manifest.json"
_STEP = "step.jaxexport"
_PARAMS = "params.npz"
_MEMORY = "memory.npz"


def _flatten_vars(variables) -> Dict[str, np.ndarray]:
    flat = traverse_util.flatten_dict(jax.device_get(variables), sep="/")
    return {k: np.asarray(v) for k, v in flat.items()}


def _unflatten_vars(flat: Dict[str, np.ndarray]):
    return traverse_util.unflatten_dict(dict(flat), sep="/")


def export_serving_step(
    cfg: ModelConfig,
    variables,
    out_dir: str,
    batch: int = 1,
    memory_window: Optional[int] = None,
    platforms: Optional[Tuple[str, ...]] = None,
) -> str:
    """Serialize the batched streaming tick to ``out_dir``.

    The exported callable is
    ``(variables, frames[batch,1,H,W,3], *memory) -> (kept, valid, num_kept,
    *new_memory)`` — one frame per stream per call, memory carried by the
    caller exactly as :class:`~phnet_tpu.serving.StreamingServer` does.

    ``platforms``: lowering platforms for the artifact (default: the
    current backend). Pass ``("tpu", "cpu")`` to produce one artifact
    that runs on both.
    """
    from .serving import packed_frame_shape, resolve_serving_ingest

    # the artifact serializes the SAME ingestion StreamingServer runs
    # (s2d-packed on TPU — zero device layout copies; see
    # resolve_serving_ingest) so deployed and live ticks are the same
    # compiled program shape-for-shape
    cfg, packed = resolve_serving_ingest(cfg)
    model = PHNet(cfg)
    window = memory_window or (cfg.memory.window if cfg.memory.window > 0
                               else 64)
    mem0 = init_memory(cfg, batch, window)
    mem_cls = type(mem0)

    def step(variables, frames, *mem_leaves):
        mem = mem_cls(*mem_leaves)
        outs, new_mem = model.apply(
            variables, frames, None, train=False, initial_memory=mem)
        return (outs.kept[0], outs.kept_valid[0], outs.num_kept[0],
                *tuple(new_mem))

    fdt = (jnp.bfloat16 if packed and cfg.compute_dtype == "bfloat16"
           else jnp.float32)
    frames_spec = jax.ShapeDtypeStruct(
        (batch, 1) + packed_frame_shape(packed, cfg.img_h, cfg.img_w), fdt)
    var_spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        jax.device_get(variables))
    mem_specs = tuple(
        jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x))
        for x in tuple(mem0))

    kwargs = {"platforms": platforms} if platforms else {}
    exported = jax_export.export(jax.jit(step), **kwargs)(
        var_spec, frames_spec, *mem_specs)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _STEP), "wb") as f:
        f.write(exported.serialize())
    np.savez(os.path.join(out_dir, _PARAMS), **_flatten_vars(variables))
    np.savez(os.path.join(out_dir, _MEMORY),
             **{f"m{i}": np.asarray(x) for i, x in enumerate(tuple(mem0))})
    spec = cfg.lane
    manifest = {
        "kind": "serving_step",
        "jax_version": jax.__version__,
        "batch": batch,
        "memory_window": window,
        "memory_class": mem_cls.__name__,
        "img_h": cfg.img_h,
        "img_w": cfg.img_w,
        "packed": packed,
        "frames_dtype": np.dtype(fdt).name if fdt == jnp.float32
        else "bfloat16",
        "platforms": list(platforms) if platforms else None,
        # decode constants so a loader can rebuild Lane points without
        # the config dataclasses
        "lane_spec": dataclasses.asdict(spec),
        "max_lanes": cfg.max_lanes,
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return out_dir


class DeployedServer:
    """Ticking server rebuilt from an exported artifact directory.

    Mirrors :class:`~phnet_tpu.serving.StreamingServer`'s tick semantics
    (same kept/valid outputs, caller-visible memory carry) but executes
    the deserialized StableHLO — the PHNet module tree is never
    constructed. Lane decoding stays available through
    :func:`phnet_tpu.geometry.decode_predictions` on the returned rows.
    """

    def __init__(self, art_dir: str):
        with open(os.path.join(art_dir, _MANIFEST)) as f:
            self.manifest = json.load(f)
        with open(os.path.join(art_dir, _STEP), "rb") as f:
            self._exported = jax_export.deserialize(f.read())
        with np.load(os.path.join(art_dir, _PARAMS)) as z:
            self.variables = _unflatten_vars({k: z[k] for k in z.files})
        with np.load(os.path.join(art_dir, _MEMORY)) as z:
            self._mem0 = tuple(z[f"m{i}"] for i in range(len(z.files)))
        self.memory = self._mem0
        self.batch = int(self.manifest["batch"])
        from .config import LaneSpec

        self.lane_spec = LaneSpec(**self.manifest["lane_spec"])

    def reset(self):
        self.memory = self._mem0

    def tick(self, frames: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """frames: [batch, H, W, 3] float32 (one frame per stream) — or
        already in the artifact's packed layout (see manifest "packed").
        Returns (kept [batch, K, dim], valid [batch, K]) as numpy; the
        temporal memory advances internally."""
        if frames.ndim == 3:
            frames = frames[None]
        packed = self.manifest.get("packed")
        if packed:
            from .serving import pack_frame_np

            h, w = self.manifest["img_h"], self.manifest["img_w"]
            frames = np.stack([pack_frame_np(f, packed, h, w)
                               for f in frames])
        frames = frames[:, None].astype(np.float32)
        if self.manifest.get("frames_dtype") == "bfloat16":
            import jax.numpy as _jnp

            frames = np.asarray(_jnp.asarray(frames, _jnp.bfloat16))
        out = self._exported.call(self.variables, frames, *self.memory)
        kept, valid, _num, *mem = out
        self.memory = tuple(mem)
        return np.asarray(kept), np.asarray(valid)

    def decode(self, kept: np.ndarray, valid: np.ndarray,
               ori_img_h=0, cut_height=0):
        """Decode kept rows to :class:`~phnet_tpu.geometry.Lane` objects
        using the lane-spec constants frozen in the manifest — the SAME
        :func:`phnet_tpu.geometry.decode_kept_rows` path as the live
        ``StreamingServer.decode``, so a deployed artifact yields identical
        lane points. ``ori_img_h``/``cut_height``: an int applied to every
        stream, or a length-``batch`` sequence of per-stream values
        (matching the live server's per-stream attach-time geometry)."""
        from .geometry import decode_kept_rows

        spec = self.lane_spec
        n = kept.shape[0]
        ori = ([ori_img_h] * n if np.ndim(ori_img_h) == 0 else list(ori_img_h))
        cut = ([cut_height] * n if np.ndim(cut_height) == 0 else list(cut_height))
        if len(ori) != n or len(cut) != n:
            raise ValueError(
                f"per-stream geometry length mismatch: batch={n}, "
                f"ori_img_h={len(ori)}, cut_height={len(cut)}")
        return [
            decode_kept_rows(
                np.asarray(kept[b])[np.asarray(valid[b])], spec,
                ori_img_h=ori[b], cut_height=cut[b])
            for b in range(n)
        ]
