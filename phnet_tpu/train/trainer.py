"""Epoch training driver.

Equivalent of the reference's ``trainVIL.py:55-265`` / ``trainOL.py`` main
loops: epoch iteration with per-iteration cosine LR, windowed loss meter,
max_skip curriculum growth every ``epochs_per_increment`` epochs, rank-0
checkpointing of periodic + best states, full resume (including curriculum).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..losses import LaneCriterion
from ..models import PHNet
from ..parallel import (
    batch_sharding, global_batch, is_multihost, make_mesh,
    replicate_sharding, shard_params,
)
from ..utils.logger import AverageMeter, TextLogger
from .checkpoint import CheckpointManager
from .optimizer import build_optimizer, cosine_schedule
from .state import create_train_state
from .step import make_train_step


def train(
    cfg: Config,
    dataset,
    loader,
    workdir: str,
    epochs: Optional[int] = None,
    mesh=None,
    resume: bool = False,
    initial: Optional[str] = None,
    log_every: int = 10,
    verbose: bool = True,
):
    tcfg = cfg.train
    epochs = epochs or tcfg.epochs
    # programmatic callers (not just the CLI entries) get warm restarts too
    from ..utils.cache import enable_persistent_cache
    enable_persistent_cache()
    model = PHNet(cfg.model)
    criterion = LaneCriterion(cfg.model, tcfg.loss)
    # per-iteration cosine over the full run (reference:
    # T_max = len(trainset) * epochs / world_size, trainVIL.py:117)
    total_steps = max(len(loader) * epochs, 1)
    tx = build_optimizer(tcfg, total_steps)
    lr_at = cosine_schedule(tcfg.learning_rate, total_steps)

    batch0 = next(iter(loader))
    frames0 = jnp.asarray(batch0["frames"])
    labels0 = jnp.asarray(batch0["labels"])
    state = create_train_state(
        model, cfg.model, jax.random.key(tcfg.seed), frames0, labels0, tx)

    ckpt = CheckpointManager(workdir)
    start_epoch = 0
    if resume:
        state, start_epoch, max_skip = ckpt.restore_state(state)
        dataset.set_max_skip(max_skip)
    elif initial:
        state = ckpt.restore_weights(state, initial)

    if mesh is not None:
        multihost = is_multihost()
        psh = shard_params(state.params, mesh)
        if multihost:
            # params/opt state are identical on every process (same init
            # seed, same restore); lift them onto the global mesh from the
            # full local copies. Batches differ per process and go through
            # make_array_from_process_local_data below.
            from ..parallel.multihost import global_tree, replicate_tree
            state = state.replace(
                params=global_tree(state.params, psh),
                batch_stats=replicate_tree(mesh, state.batch_stats),
                opt_state=replicate_tree(mesh, state.opt_state),
            )
        else:
            state = state.replace(
                params=jax.device_put(state.params, psh),
                batch_stats=jax.device_put(
                    state.batch_stats, replicate_sharding(mesh)),
                opt_state=jax.device_put(
                    state.opt_state, replicate_sharding(mesh)),
            )
        bsh = batch_sharding(mesh)

    step_fn = jax.jit(make_train_step(
        model, criterion, tx, accum_steps=tcfg.accum_steps))
    step_call = step_fn  # swapped for the AOT executable on multihost
    logger = TextLogger(f"{workdir}/log.txt")
    logger.set_items(["Epoch", "LR", "TrainLoss"])

    min_loss = float(state.min_loss)
    history = []
    for epoch in range(start_epoch, epochs):
        loader.set_epoch(epoch)
        meter = AverageMeter()
        data_meter = AverageMeter()
        t_end = time.time()
        for it, batch in enumerate(loader):
            data_meter.update(time.time() - t_end)
            if mesh is not None and multihost:
                # the loader yields this process's batch shard; stitch
                # the global array across hosts (no host materializes
                # the full batch)
                frames = global_batch(mesh, np.asarray(batch["frames"]))
                labels = global_batch(mesh, np.asarray(batch["labels"]))
            elif mesh is not None:
                frames = jax.device_put(batch["frames"], bsh)
                labels = jax.device_put(batch["labels"], bsh)
            else:
                frames = jnp.asarray(batch["frames"])
                labels = jnp.asarray(batch["labels"])
            rng = jax.random.fold_in(jax.random.key(tcfg.seed), int(state.step))
            if mesh is not None and multihost:
                from ..parallel.multihost import global_key, warm_collectives
                rng = global_key(mesh, rng)
                if epoch == start_epoch and it == 0:
                    # AOT-compile and keep the executable (lower().compile()
                    # does NOT populate the jit dispatch cache — discarding
                    # it would re-compile after the alignment point), then
                    # establish the collective-fabric contexts in lockstep
                    # (warm_collectives compiles its warm program, re-aligns
                    # every process at a coordination barrier, executes)
                    step_call = step_fn.lower(
                        state, frames, labels, rng).compile()
                    warm_collectives(mesh)
            state, metrics = step_call(state, frames, labels, rng)
            loss = float(metrics["loss"])
            assert np.isfinite(loss), "Loss is NaN!"
            meter.update(loss)
            if verbose and it % log_every == 0:
                print(
                    f"epoch {epoch + 1}/{epochs} it {it + 1}/{len(loader)} "
                    f"loss {loss:.4f} (avg {meter.avg:.4f}) "
                    f"data {data_meter.val:.3f}s",
                    flush=True,
                )
            t_end = time.time()

        train_loss = meter.avg
        history.append(train_loss)
        # log the LIVE cosine LR at the current step, like the reference's
        # scheduler.get_lr() (trainVIL.py:176) — not the base LR
        logger.log(epoch + 1, float(lr_at(int(state.step))), train_loss)

        # curriculum (trainVIL.py:178-183)
        if (epoch + 1) % tcfg.epochs_per_increment == 0:
            dataset.increase_max_skip()

        is_best = train_loss <= min_loss
        min_loss = min(min_loss, train_loss)
        state = state.replace(min_loss=jnp.float32(min_loss))
        if is_best or (epoch + 1) % tcfg.epoch_per_test == 0:
            ckpt.save(
                state, epoch + 1, dataset.max_skip, is_best=is_best,
                periodic=(epoch + 1) % tcfg.epoch_per_test == 0,
            )
    logger.close()
    return state, history
