"""Checkpoint save/resume with Orbax.

Equivalent of the reference's ``save_checkpoint_V2``
(``libs/utils/utility.py:10-16``) + resume path (``trainVIL.py:136-153``):
periodic per-epoch saves plus a ``best`` copy, payload = model params,
batch stats, optimizer state, epoch, min_loss and the dataset curriculum
state (``max_skip``). Only process 0 writes
(``jax.process_index() == 0`` == the reference's rank-0 check).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


def _to_payload(state: TrainState, epoch: int, max_skip: int) -> Dict[str, Any]:
    return {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
        "min_loss": np.asarray(state.min_loss),
        "epoch": np.asarray(epoch),
        "max_skip": np.asarray(max_skip),
    }


class CheckpointManager:
    def __init__(self, directory: str):
        self.dir = os.path.abspath(directory)
        os.makedirs(self.dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def _path(self, name) -> str:
        return os.path.join(self.dir, str(name))

    def save(self, state: TrainState, epoch: int, max_skip: int,
             is_best: bool = False, periodic: bool = True):
        if jax.process_index() != 0:
            return
        payload = _to_payload(state, epoch, max_skip)
        if periodic:
            self._ckpt.save(self._path(f"epoch_{epoch}"), payload, force=True)
        if is_best:
            self._ckpt.save(self._path("best"), payload, force=True)
        self._ckpt.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        if not os.path.isdir(self.dir):
            return None
        epochs = [
            int(d.split("_", 1)[1])
            for d in os.listdir(self.dir)
            if d.startswith("epoch_") and d.split("_", 1)[1].isdigit()
        ]
        return max(epochs) if epochs else None

    def restore(self, state: TrainState, name=None) -> Dict[str, Any]:
        """Restore into the structure of `state`. name: 'best', an epoch
        int, or None for the latest epoch."""
        if name is None:
            ep = self.latest_epoch()
            if ep is None:
                raise FileNotFoundError(f"no checkpoints in {self.dir}")
            name = f"epoch_{ep}"
        elif isinstance(name, int):
            name = f"epoch_{name}"
        target = _to_payload(state, 0, 0)
        payload = self._ckpt.restore(self._path(name), target=target)
        return payload

    def restore_state(self, state: TrainState, name=None):
        """(state, epoch, max_skip) fully restored — the reference's
        ``resume_model`` path (model+optimizer+scheduler+epoch+minloss+
        curriculum, ``trainVIL.py:136-153``)."""
        payload = self.restore(state, name)
        new_state = state.replace(
            params=payload["params"],
            batch_stats=payload["batch_stats"],
            opt_state=payload["opt_state"],
            step=payload["step"],
            min_loss=payload["min_loss"],
        )
        return new_state, int(payload["epoch"]), int(payload["max_skip"])

    def restore_weights(self, state: TrainState, name="best"):
        """Weights-only init — the reference's ``initial_model`` path
        (``trainVIL.py:127-135``)."""
        payload = self.restore(state, name)
        return state.replace(
            params=payload["params"], batch_stats=payload["batch_stats"])
