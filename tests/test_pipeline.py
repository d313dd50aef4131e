"""End-to-end plumbing tests: synthetic data -> (labels-as-predictions |
untrained model) -> decode -> emission -> CULane metric."""

import glob
import os

import numpy as np
import jax

from phnet_tpu.config import LaneSpec
from phnet_tpu.data import SyntheticVideoDataset
from phnet_tpu.evaluation import (
    aggregate_results, culane_metric, read_lines_txt, write_gt_txt,
    write_pred_txt,
)
from phnet_tpu.geometry import decode_predictions
from phnet_tpu.pipeline import InferencePipeline

from test_model import tiny_cfg


def test_labels_decode_emit_score_roundtrip(tmp_path):
    """GT labels pushed through decode+emit must score F1=1.0 against the
    raw GT points — validates that label encoding, lane decoding, txt
    emission and the metric all agree on geometry."""
    spec = LaneSpec(n_offsets=36, n_lengths=2)
    ds = SyntheticVideoDataset(n_videos=1, frames_per_video=3, spec=spec)
    clip = ds.get_clip(0)
    img_h, img_w = clip["size"]

    results = []
    for t, (fname, label) in enumerate(zip(clip["frame_names"], clip["labels"])):
        rows = label[label[:, 1] == 1].copy()
        # labels store absolute px xs and start_x/img_w; convert to the
        # model's normalized convention (reference get_labels,
        # RouterV4.py:444-462)
        rows[:, spec.col_xs:] /= (img_w - 1)
        rows[:, spec.col_start_x] = rows[:, spec.col_start_x] * img_w / (img_w - 1)
        rows[:, spec.col_length] = np.round(rows[:, spec.col_length] * spec.n_strips)
        rows[:, spec.col_invalid_length] = np.round(
            rows[:, spec.col_invalid_length] * spec.n_strips)
        lanes = decode_predictions(rows, spec)
        p_pred = write_pred_txt(str(tmp_path / "pred"), "v0", fname, lanes,
                                (img_h, img_w), "vil")
        p_anno = write_gt_txt(str(tmp_path / "anno"), "v0", fname,
                              clip["points"][t])
        pred = read_lines_txt(p_pred)
        anno = read_lines_txt(p_anno)
        assert len(pred) == len(anno) > 0
        results.append(culane_metric(pred, anno, (img_h, img_w, 3)))

    agg = aggregate_results(results)
    assert agg["F1"] == 1.0, agg
    assert agg["miou"] > 0.8, agg


def test_pipeline_untrained_model_runs(tmp_path):
    """Untrained model end-to-end over a synthetic video: emission files
    appear for every frame (possibly empty), fps is reported."""
    cfg_model = tiny_cfg(window=4)
    from phnet_tpu.config import Config
    cfg = Config(model=cfg_model)
    ds = SyntheticVideoDataset(
        n_videos=2, frames_per_video=4,
        img_h=cfg_model.img_h, img_w=cfg_model.img_w,
        spec=cfg_model.lane, max_lanes=cfg_model.max_lanes,
    )
    from phnet_tpu.models import PHNet
    model = PHNet(cfg_model)
    frames0 = np.asarray(ds.get_clip(0)["frames"])[None, :2]
    variables = jax.jit(lambda r, f: model.init(r, f, None, train=False))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        frames0,
    )
    pipe = InferencePipeline(cfg, variables, chunk=2, memory_window=8)
    stats = pipe.run_and_emit(
        ds, str(tmp_path / "pred"), str(tmp_path / "anno"), fmt="vil")
    assert stats["frames"] == 8
    assert stats["fps"] > 0
    pred_files = sorted(glob.glob(str(tmp_path / "pred" / "*" / "*.lines.txt")))
    anno_files = sorted(glob.glob(str(tmp_path / "anno" / "*" / "*.lines.txt")))
    assert len(pred_files) == 8 and len(anno_files) == 8
    # GT files contain real lanes
    assert len(read_lines_txt(anno_files[0])) >= 2
