"""Load reference-style executable option files into :class:`Config`.

The reference configures everything through executable python option files
loaded by an mmcv-style ``Config.fromfile`` (``libs/utils/config.py:60-130``;
``options/optionsV3.py`` etc. define plain module-level globals). Users
migrating from the reference can point :func:`load_reference_options` at
their existing option file; every recognized key maps onto the dataclass
config, unrecognized keys are returned for inspection.
"""

from __future__ import annotations

import dataclasses
import types
from typing import Any, Dict, Tuple

from ..config import (
    Config,
    LaneSpec,
    LossConfig,
    MemoryConfig,
    NeckConfig,
    TestParams,
    openlane_config,
    vil100_config,
)

_KNOWN = {
    "img_h", "img_w", "num_points", "n_offsets", "max_lanes", "cut_scale",
    "num_priors", "backbone", "neck", "test_parameters", "cls_weight",
    "reg_weight", "iou_weight", "learning_rate", "solver", "momentum",
    "weight_decay", "epochs", "train_batch", "sampled_frames", "max_skip",
    "epochs_per_increment", "samples_per_video", "epoch_per_test",
    "save_freq_max", "root", "trainset", "valset",
}


def exec_options_file(path: str) -> Dict[str, Any]:
    """Execute an options .py file in an isolated module namespace and
    return its public globals (the reference imports it as a temp module)."""
    module = types.ModuleType("phnet_options")
    with open(path) as f:
        src = f.read()
    exec(compile(src, path, "exec"), module.__dict__)
    return {
        k: v for k, v in vars(module).items()
        if not k.startswith("_") and not isinstance(v, types.ModuleType)
    }


def load_reference_options(path: str) -> Tuple[Config, Dict[str, Any]]:
    """(Config, unmapped_keys). Dataset family inferred from ``trainset``."""
    opts = exec_options_file(path)

    dataset = (opts.get("trainset") or ["VIL100"])
    if isinstance(dataset, (list, tuple)):
        dataset = dataset[0]
    is_vil = str(dataset).upper().startswith("VIL")
    cfg = vil100_config() if is_vil else openlane_config(
        n_offsets=int(opts.get("num_points", 72)))

    model = cfg.model
    if "num_points" in opts:
        model = dataclasses.replace(
            model,
            lane=LaneSpec(n_offsets=int(opts["num_points"]),
                          n_lengths=model.lane.n_lengths),
        )
    updates: Dict[str, Any] = {}
    if "img_h" in opts:
        updates["img_h"] = int(opts["img_h"])
    if "img_w" in opts:
        updates["img_w"] = int(opts["img_w"])
    if "max_lanes" in opts:
        updates["max_lanes"] = int(opts["max_lanes"])
    if "cut_scale" in opts:
        updates["cut_scale"] = float(opts["cut_scale"])
    if "neck" in opts and isinstance(opts["neck"], dict):
        n = opts["neck"]
        oc = n.get("out_channels", model.neck.out_channels)
        updates["neck"] = NeckConfig(
            in_channels=tuple(n.get("in_channels", model.neck.in_channels)),
            out_channels=tuple(oc) if isinstance(oc, (list, tuple)) else oc,
            num_outs=int(n.get("num_outs", model.neck.num_outs)),
        )
    if "test_parameters" in opts and isinstance(opts["test_parameters"], dict):
        tp = opts["test_parameters"]
        updates["test"] = TestParams(
            conf_threshold=float(tp.get("conf_threshold", 0.5)),
            nms_thres=float(tp.get("nms_thres", 50.0)),
            nms_topk=int(tp.get("nms_topk", opts.get("max_lanes", 8))),
        )
    if "num_priors" in opts:
        updates["head"] = dataclasses.replace(
            model.head, num_priors=int(opts["num_priors"]))
    if "save_freq_max" in opts and not is_vil:
        updates["memory"] = MemoryConfig(
            window=int(opts["save_freq_max"]),
            slots_per_frame=int(opts.get("max_lanes", 4)) + 1,
        )
    model = dataclasses.replace(model, **updates)

    train = cfg.train
    t_updates: Dict[str, Any] = {}
    for src_key, dst_key, cast in [
        ("epochs", "epochs", int),
        ("train_batch", "train_batch", int),
        ("sampled_frames", "sampled_frames", int),
        ("learning_rate", "learning_rate", float),
        ("solver", "solver", lambda s: str(s).lower()),
        ("weight_decay", "weight_decay", float),
        ("epochs_per_increment", "epochs_per_increment", int),
        ("samples_per_video", "samples_per_video", int),
        ("epoch_per_test", "epoch_per_test", int),
    ]:
        if src_key in opts:
            t_updates[dst_key] = cast(opts[src_key])
    if "momentum" in opts:
        m = opts["momentum"]
        t_updates["momentum"] = tuple(m) if isinstance(m, (list, tuple)) else (float(m), 0.999)
    if "max_skip" in opts:
        ms = opts["max_skip"]
        t_updates["max_skip"] = int(ms[0] if isinstance(ms, (list, tuple)) else ms)
    loss_updates = {}
    for k in ("cls_weight", "reg_weight", "iou_weight"):
        if k in opts:
            loss_updates[k] = float(opts[k])
    if loss_updates:
        t_updates["loss"] = dataclasses.replace(train.loss, **loss_updates)
    train = dataclasses.replace(train, **t_updates)

    data = cfg.data
    d_updates = {}
    if "root" in opts:
        d_updates["root"] = str(opts["root"])
    for k in ("img_h", "img_w", "max_lanes", "cut_scale"):
        if k in opts:
            d_updates[k] = opts[k]
    data = dataclasses.replace(data, **d_updates)

    unmapped = {k: v for k, v in opts.items() if k not in _KNOWN}
    return Config(model=model, train=train, data=data), unmapped
