"""High-level inference pipeline: video in, Lane objects / CULane txt out.

Equivalent of the reference's test drivers (``testVIL.py:72-130``: whole
video per call; ``testOLV3.py:95-121``: 16-frame chunks), built on the
jitted chunked model with the temporal memory carried across chunks
(a superset: the reference resets memory at chunk boundaries for OL; pass
``reset_memory_per_chunk=True`` for that exact behaviour).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config, ModelConfig
from .evaluation.emit import write_gt_txt, write_pred_txt
from .geometry import Lane, decode_kept_rows
from .models import PHNet
from .models.phnet import init_memory


class InferencePipeline:
    def __init__(
        self,
        cfg: Config,
        variables,
        chunk: int = 16,
        memory_window: Optional[int] = None,
        reset_memory_per_chunk: bool = False,
    ):
        self.cfg = cfg
        self.mcfg: ModelConfig = cfg.model
        self.model = PHNet(self.mcfg)
        self.variables = variables
        self.chunk = chunk
        self.reset_per_chunk = reset_memory_per_chunk
        # VIL keeps the whole video in memory (window <= 0); size the ring
        # buffer generously for streaming
        if memory_window is None:
            memory_window = (
                self.mcfg.memory.window if self.mcfg.memory.window > 0 else 128
            )
        self.memory_window = memory_window

        def run_chunk(variables, frames, mem):
            outs, mem = self.model.apply(
                variables, frames, None, train=False, initial_memory=mem
            )
            return outs.kept, outs.kept_valid, mem

        self._run_chunk = jax.jit(run_chunk)

    # ------------------------------------------------------------------
    def run_video(
        self, frames: np.ndarray
    ) -> Tuple[List[List[Lane]], float]:
        """frames: [T, H, W, 3] normalized. Returns (per-frame Lane lists,
        model seconds)."""
        mcfg = self.mcfg
        spec = mcfg.lane
        t_total = frames.shape[0]
        chunk = self.chunk
        pad = (-t_total) % chunk
        if pad:
            frames = np.concatenate([frames, frames[-1:].repeat(pad, 0)], 0)
        mem = init_memory(mcfg, 1, self.memory_window)

        kept_all, valid_all = [], []
        t0 = time.time()
        for c in range(0, frames.shape[0], chunk):
            if self.reset_per_chunk:
                mem = init_memory(mcfg, 1, self.memory_window)
            kept, valid, mem = self._run_chunk(
                self.variables, jnp.asarray(frames[None, c : c + chunk]), mem
            )
            kept_all.append(np.array(kept[:, 0]))
            valid_all.append(np.array(valid[:, 0]))
        model_seconds = time.time() - t0

        kept_np = np.concatenate(kept_all)[:t_total]  # [T, K, dim]
        valid_np = np.concatenate(valid_all)[:t_total]

        per_frame: List[List[Lane]] = [
            decode_kept_rows(kept_np[t][valid_np[t]], spec,
                             ori_img_h=self._ori_h, cut_height=self._cut)
            for t in range(t_total)
        ]
        return per_frame, model_seconds

    # ------------------------------------------------------------------
    def run_and_emit(
        self,
        dataset,
        pred_dir: str,
        anno_dir: Optional[str] = None,
        fmt: str = "vil",
        video_indices: Optional[Sequence[int]] = None,
        verbose: bool = False,
    ) -> Dict:
        """Run whole videos and emit CULane txt files; optionally also GT.

        Returns {'fps': ..., 'frames': ..., 'videos': [...]} like the
        reference's per-video fps printout (``testVIL.py:127-130``).
        """
        indices = list(video_indices) if video_indices is not None else list(
            range(len(dataset)))
        total_frames, total_seconds = 0, 0.0
        names = []
        for i in indices:
            clip = dataset.get_clip(i) if hasattr(dataset, "get_clip") else dataset[i]
            size = clip["size"]
            self._ori_h = size[0] if fmt == "vil" else 0
            self._cut = clip.get("cut", 0)
            lanes_per_frame, secs = self.run_video(clip["frames"])
            total_frames += len(lanes_per_frame)
            total_seconds += secs
            names.append(clip["name"])
            for fname, lanes in zip(clip["frame_names"], lanes_per_frame):
                write_pred_txt(pred_dir, clip["name"], fname, lanes, size, fmt)
            if anno_dir is not None:
                for fname, pts in zip(clip["frame_names"], clip["points"]):
                    write_gt_txt(anno_dir, clip["name"], fname, pts)
            if verbose:
                print(f"{clip['name']}: {len(lanes_per_frame)} frames, "
                      f"{len(lanes_per_frame)/max(secs,1e-9):.1f} fps")
        return {
            "fps": total_frames / max(total_seconds, 1e-9),
            "frames": total_frames,
            "videos": names,
        }
