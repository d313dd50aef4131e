"""Checkpoint save/restore roundtrip (orbax), including curriculum state."""

import numpy as np

import jax
import jax.numpy as jnp

from phnet_tpu.train.checkpoint import CheckpointManager

from test_train import setup_training
from test_model import tiny_cfg


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_cfg()
    model, state, step, frames, labels = setup_training(cfg, b=1, t=2)
    jstep = jax.jit(step)
    state, _ = jstep(state, frames, labels, jax.random.key(0))

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(state, epoch=3, max_skip=10, is_best=True)
    assert mgr.latest_epoch() == 3

    # full resume restores params/opt/step/curriculum
    _, fresh, _, _, _ = setup_training(cfg, b=1, t=2, seed=1)
    restored, epoch, max_skip = mgr.restore_state(fresh)
    assert epoch == 3 and max_skip == 10
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.array(a), np.array(b))
    # optimizer state restored too
    for a, b in zip(jax.tree.leaves(restored.opt_state),
                    jax.tree.leaves(state.opt_state)):
        np.testing.assert_array_equal(np.array(a), np.array(b))

    # weights-only init from 'best'
    _, fresh2, _, _, _ = setup_training(cfg, b=1, t=2, seed=2)
    w = mgr.restore_weights(fresh2, "best")
    np.testing.assert_array_equal(
        np.array(jax.tree.leaves(w.params)[0]),
        np.array(jax.tree.leaves(state.params)[0]))
    assert int(w.step) == 0  # step untouched on weights-only init


def test_native_evaluator_matches_python(tmp_path):
    import numpy as np
    import pytest

    from phnet_tpu.evaluation import (
        aggregate_results, culane_metric, read_lines_txt, write_gt_txt)
    from phnet_tpu.evaluation.native_eval import evaluate_pairs, native_available

    if not native_available():
        pytest.skip("native evaluator not built (run make in evaluation/native)")

    def lane_pts(x0, slope, n=10, y0=380, y1=100):
        ys = np.linspace(y0, y1, n)
        return np.array([(x0 + slope * (y0 - y), y) for y in ys])

    anno = [lane_pts(200, 0.2), lane_pts(500, -0.1)]
    pred = [lane_pts(203, 0.2), lane_pts(500, -0.1), lane_pts(700, 0.35)]
    af = write_gt_txt(str(tmp_path / "anno"), "v", "f0", anno)
    pf = write_gt_txt(str(tmp_path / "pred"), "v", "f0", pred)
    nat = evaluate_pairs([(pf, af)], 768, 384, 30, 0.5)
    py = aggregate_results(
        [culane_metric(read_lines_txt(pf), read_lines_txt(af), (384, 768, 3))])
    assert nat["TP"] == py["TP"] and nat["FP"] == py["FP"] and nat["FN"] == py["FN"]
    assert abs(nat["miou"] - py["miou"]) < 0.01
