"""VIL-100 dataset reader.

Follows the reference's on-disk schema (``libs/dataset/dataV3.py:64-205``):

  <root>/VIL100/
    data/db_info.yaml            sequences: [{name, set: train|test}, ...]
    JPEGImages/<vid>/<frame>.jpg
    Annotations/<vid>/<frame>.png   (indexed segmentation masks)
    Json/<vid>/<frame>.jpg.json  {annotations: {lane: [{lane_id, points,
                                                        occlusion}]}}
    Flow/<vid>/<frame>{u,v}.jpg  (precomputed Farneback flow, optional)

Behaviours reproduced: top ``cut_scale`` crop with lane-y correction
(``dataV3.py:154-155, 207-216``), random temporal sampling with a growing
``max_skip`` curriculum (``dataV3.py:119-130``, ``increase_max_skip``
:101-102), per-video samples_per_video, whole-video test mode.

The active model ignores the flow/segmentation inputs (they are loaded but
unused in ``RouterWithB.forward``); both are optional here and off by
default. When enabled they are loaded *before* augmentation and ride the
same geometric transforms as the image (the reference passes them through
one imgaug call as SegmentationMaps/Heatmaps, transformV4.py:236-246);
flow jpgs are dequantized per ``dataV3.py:168-176``. The stochastic
augmentation is retried up to 30 times if label encoding fails
(transformV4.py:241-259).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import cv2
import numpy as np

from ..config import DataConfig, LaneSpec, TrainConfig
from ..geometry import encode_lane_label
from .flow import dequantize_flow
from .transforms import Normalize, TrainAugment, resize_with_lanes

MAX_TRAINING_SKIP = 100


def _load_yaml_sequences(path: str):
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)["sequences"]


class VIL100Dataset:
    def __init__(
        self,
        data_cfg: DataConfig,
        spec: LaneSpec,
        train: bool = True,
        sampled_frames: int = 16,
        max_skip: int = 5,
        skip_increment: int = 5,
        samples_per_video: int = 2,
        augment: Optional[TrainAugment] = None,
        load_seg: bool = False,
        load_flow: bool = False,
        seed: int = 3407,
        native_decode: str = "auto",
    ):
        self.cfg = data_cfg
        self.spec = spec
        self.train = train
        root = os.path.join(data_cfg.root, "VIL100")
        self.imgdir = os.path.join(root, "JPEGImages")
        self.annodir = os.path.join(root, "Annotations")
        self.jsondir = os.path.join(root, "Json")
        self.flowdir = os.path.join(root, "Flow")
        db = _load_yaml_sequences(os.path.join(root, "data", "db_info.yaml"))
        target = "train" if train else "test"
        self.videos = [s["name"] for s in db if s["set"] == target]
        self.sampled_frames = sampled_frames
        self.max_skip = max_skip
        self.increment = skip_increment
        self.samples_per_video = samples_per_video if train else 1
        self.augment = augment
        self.load_seg = load_seg
        self.load_flow = load_flow
        self.normalize = Normalize()
        self.rng = np.random.default_rng(seed)
        # native C++ clip decoder (decode+crop+resize+normalize in one
        # OpenMP call) for the non-augmented path; "auto" uses it when the
        # .so builds, "never" forces the cv2 path, "always" raises if
        # unavailable. Outputs match cv2 to ~1e-2 in normalized units
        # (JPEG IDCT + resize rounding).
        self.native_decode = False
        if native_decode in ("auto", "always"):
            from .native_loader import native_available

            self.native_decode = native_available()
            if native_decode == "always" and not self.native_decode:
                raise RuntimeError("native clip loader unavailable")

    def __len__(self):
        return self.samples_per_video * len(self.videos)

    # curriculum (dataV3.py:101-105)
    def increase_max_skip(self):
        self.max_skip = min(self.max_skip + self.increment, MAX_TRAINING_SKIP)

    def set_max_skip(self, max_skip: int):
        self.max_skip = max_skip

    def _sample_frames(self, frames: List[str]) -> List[str]:
        n = len(frames)
        if not self.train:
            return frames
        nsamples = min(self.sampled_frames, n)
        picked, last = [], -1
        for i in range(nsamples):
            if i == 0:
                last = int(self.rng.integers(0, n - nsamples + 1))
            else:
                hi = min(last + self.max_skip + 1, n - nsamples + i + 1)
                last = int(self.rng.integers(last + 1, hi))
            picked.append(frames[last])
        return picked

    def __getitem__(self, idx: int) -> Dict:
        vid = self.videos[idx // self.samples_per_video]
        jsonfolder = os.path.join(self.jsondir, vid)
        frames = sorted(name[:5] for name in os.listdir(jsonfolder))
        sample_frames = self._sample_frames(frames)

        first = cv2.imread(os.path.join(self.imgdir, vid, sample_frames[0] + ".jpg"))
        ori_h, ori_w = first.shape[:2]
        cut = int(ori_h * self.cfg.cut_scale)

        # batch-decode the whole clip natively when no augmentation will
        # touch the pixels (test/eval path)
        native_frames = None
        use_aug = self.augment is not None and self.train
        if self.native_decode and not use_aug:
            from .native_loader import decode_clip

            native_frames = decode_clip(
                [os.path.join(self.imgdir, vid, n + ".jpg")
                 for n in sample_frames],
                cut, self.cfg.img_h, self.cfg.img_w)

        imgs, labels, points, segs, flows = [], [], [], [], []
        for fi, name in enumerate(sample_frames):
            img0 = None
            if native_frames is None:
                img0 = cv2.imread(
                    os.path.join(self.imgdir, vid, name + ".jpg"))
                img0 = cv2.cvtColor(img0, cv2.COLOR_BGR2RGB)[cut:]
            with open(os.path.join(jsonfolder, name + ".jpg.json")) as f:
                info = json.load(f)
            lanes0, lane_ids0 = [], []
            for lane in info["annotations"]["lane"]:
                pts = np.array(
                    [(p[0], p[1] - cut) for p in lane["points"]], np.float32)
                if len(pts) < 2:
                    continue
                lanes0.append(pts)
                lane_ids0.append(lane["lane_id"] - 1)
            seg0 = flow0 = None
            if self.load_seg:
                seg0 = cv2.imread(
                    os.path.join(self.annodir, vid, name + ".png"),
                    cv2.IMREAD_GRAYSCALE)[cut:]
            if self.load_flow:
                # quantized Farneback flow jpgs (dataV3.py:168-176)
                u = cv2.imread(os.path.join(self.flowdir, vid, name + "u.jpg"),
                               cv2.IMREAD_GRAYSCALE)
                v = cv2.imread(os.path.join(self.flowdir, vid, name + "v.jpg"),
                               cv2.IMREAD_GRAYSCALE)
                if u is not None and v is not None:
                    flow0 = dequantize_flow(
                        u, v, *u.shape[:2])[cut:].astype(np.float32)

            if self.augment is not None and self.train:
                # ids travel with their lanes: a lane clipped away by the
                # affine drops its own id (reference keys label rows by
                # lane_id, transformV4.py:183-216). Seg/flow planes ride
                # the same geometric ops. The stochastic transform gets up
                # to 30 tries if label encoding fails (transformV4.py:241-259).
                for attempt in range(30):
                    try:
                        res = self.augment(img0, lanes0, lane_ids0,
                                           seg=seg0, flow=flow0)
                        img, lanes, lane_ids = res[0], res[1], res[2]
                        k = 3
                        seg = flow = None
                        if seg0 is not None:
                            seg = res[k]
                            k += 1
                        if flow0 is not None:
                            flow = res[k]
                        label = encode_lane_label(
                            [list(map(tuple, p[np.argsort(-p[:, 1])]))
                             for p in lanes],
                            lane_ids, self.spec, self.cfg.img_h,
                            self.cfg.img_w, self.cfg.max_lanes,
                        )
                        break
                    except Exception:
                        if attempt == 29:
                            raise
            else:
                if native_frames is None:
                    img, lanes = resize_with_lanes(
                        img0, lanes0, self.cfg.img_h, self.cfg.img_w)
                else:
                    # frame already decoded+resized+normalized natively;
                    # scale the lanes by the same geometry
                    img = None
                    sx = self.cfg.img_w / ori_w
                    sy = self.cfg.img_h / (ori_h - cut)
                    lanes = [l * np.array([sx, sy], np.float32)
                             for l in lanes0]
                lane_ids = lane_ids0
                seg = None if seg0 is None else cv2.resize(
                    seg0, (self.cfg.img_w, self.cfg.img_h),
                    interpolation=cv2.INTER_NEAREST)
                flow = None if flow0 is None else cv2.resize(
                    flow0, (self.cfg.img_w, self.cfg.img_h),
                    interpolation=cv2.INTER_LINEAR)
                label = encode_lane_label(
                    [list(map(tuple, p[np.argsort(-p[:, 1])])) for p in lanes],
                    lane_ids, self.spec, self.cfg.img_h, self.cfg.img_w,
                    self.cfg.max_lanes,
                )
            imgs.append(self.normalize(img) if img is not None
                        else native_frames[fi])
            labels.append(label)
            points.append(lanes)
            if seg is not None:
                segs.append(seg)
            if self.load_flow:
                # keep flows frame-aligned with imgs even when a frame's
                # quantized flow jpgs are missing/corrupt: zero flow (= no
                # motion) rather than silently dropping the row and
                # shifting every later frame's flow by one
                flows.append(flow if flow is not None else np.zeros(
                    (self.cfg.img_h, self.cfg.img_w, 2), np.float32))

        out = {
            "name": vid,
            "frames": np.stack(imgs),
            "labels": np.stack(labels),
            "points": points,
            "size": (ori_h, ori_w),
            "cut": cut,
            "frame_names": sample_frames,
        }
        if segs:
            out["seg"] = np.stack(segs)
        if flows:
            out["flow"] = np.stack(flows)
        return out
