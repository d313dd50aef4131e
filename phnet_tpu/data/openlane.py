"""OpenLane-V dataset reader.

Follows the reference's schema (``libs/dataset/openlane/datasetOL.py:19-141``):

  <root>/OpenLane/images/{training,validation}/<video>/<frame>.jpg
  <root>/OpenLane/OpenLane-V/label/{training,validation}/<video>/<frame>.pickle
      pickle = {'lanes': [ndarray (N, 2)]}

Behaviours reproduced: 480 px sky crop with lane-y correction
(``datasetOL.py:47-58``), random horizontal flip of the whole clip and
random clip reversal in training (``datasetOL.py:89-110``), temporal
sampling with max_skip (capped at 1 like the reference's
MAX_TRAINING_SKIP), whole-video validation.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional

import cv2
import numpy as np

from ..config import DataConfig, LaneSpec
from ..geometry import encode_lane_label
from .transforms import Normalize, TrainAugment, resize_with_lanes

MAX_TRAINING_SKIP = 1


def _jpeg_dims(path: str):
    """(h, w) from the JPEG SOF header without decoding any pixels.

    The native fast path only needs the source dimensions for lane
    scaling; a full cv2 decode of the first frame just to read ``.shape``
    would cost one redundant JPEG decode per clip. Falls back to cv2 on
    anything unparseable."""
    try:
        with open(path, "rb") as f:
            if f.read(2) != b"\xff\xd8":
                raise ValueError("not a JPEG")
            while True:
                byte = f.read(1)
                if not byte:
                    raise ValueError("no SOF marker")
                if byte != b"\xff":
                    continue
                marker = f.read(1)
                while marker == b"\xff":  # fill bytes
                    marker = f.read(1)
                m = marker[0]
                if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
                    seg = f.read(7)  # len(2) precision(1) h(2) w(2)
                    return (int.from_bytes(seg[3:5], "big"),
                            int.from_bytes(seg[5:7], "big"))
                if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
                    continue  # no-length markers
                seg_len = int.from_bytes(f.read(2), "big")
                f.seek(seg_len - 2, os.SEEK_CUR)
    except Exception:
        img = cv2.imread(path)
        return img.shape[:2]


class OpenLaneDataset:
    def __init__(
        self,
        data_cfg: DataConfig,
        spec: LaneSpec,
        train: bool = True,
        sampled_frames: int = 16,
        max_skip: int = 1,
        skip_increment: int = 1,
        samples_per_video: int = 1,
        augment: Optional[TrainAugment] = None,
        seed: int = 3407,
        native_decode: str = "auto",
    ):
        self.cfg = data_cfg
        self.spec = spec
        self.train = train
        mode = "training" if train else "validation"
        self.mode = mode
        root = os.path.join(data_cfg.root, "OpenLane")
        self.img_root = os.path.join(root, "images", mode)
        self.label_root = os.path.join(root, "OpenLane-V", "label", mode)
        self.videos = sorted(os.listdir(self.label_root))
        self.sampled_frames = sampled_frames
        self.max_skip = max_skip
        self.increment = skip_increment
        self.samples_per_video = samples_per_video if train else 1
        self.augment = augment
        self.normalize = Normalize()
        self.rng = np.random.default_rng(seed)
        # native C++ clip decoder for the eval path (no flip/augment there;
        # see data/native_loader.py)
        self.native_decode = False
        if native_decode in ("auto", "always"):
            from .native_loader import native_available

            self.native_decode = native_available()
            if native_decode == "always" and not self.native_decode:
                raise RuntimeError("native clip loader unavailable")

    def __len__(self):
        return self.samples_per_video * len(self.videos)

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
        label_dir = os.path.join(self.label_root, vid)
        frames = sorted(n[: -len(".pickle")] for n in os.listdir(label_dir))
        sample_frames = self._sample_frames(frames)

        flip = bool(self.rng.integers(0, 2)) if self.train else False
        reverse = bool(self.rng.integers(0, 2)) if self.train else False
        if reverse:
            sample_frames = sample_frames[::-1]

        crop = self.cfg.crop_size

        # batch-decode natively when nothing stochastic touches the pixels
        # (eval path: no flip/reverse/augment)
        native_frames = None
        use_aug = (self.augment is not None and self.train) or flip
        if self.native_decode and not use_aug:
            from .native_loader import decode_clip

            nat_h, nat_w = _jpeg_dims(
                os.path.join(self.img_root, vid, sample_frames[0] + ".jpg"))
            native_frames = decode_clip(
                [os.path.join(self.img_root, vid, n + ".jpg")
                 for n in sample_frames],
                crop, self.cfg.img_h, self.cfg.img_w)

        imgs, labels, points = [], [], []
        ori_h = ori_w = None
        for fi, name in enumerate(sample_frames):
            if native_frames is None:
                img = cv2.imread(
                    os.path.join(self.img_root, vid, name + ".jpg"))
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                ori_h, ori_w = img.shape[:2]
                img = img[crop:]
            else:
                img = None
                ori_h, ori_w = nat_h, nat_w
            with open(os.path.join(label_dir, name + ".pickle"), "rb") as f:
                anno = pickle.load(f)
            lanes = []
            for pts in anno["lanes"]:
                pts = np.asarray(pts, np.float32)
                if len(pts) == 0:
                    continue
                pts = pts.copy()
                pts[:, 1] -= crop
                if flip:
                    pts[:, 0] = (ori_w - 1) - pts[:, 0]
                if len(pts) >= 3:  # reference filters len(lane) > 2
                    lanes.append(pts)
            if flip:
                img = img[:, ::-1].copy()
            if self.augment is not None and self.train:
                img, lanes = self.augment(img, lanes)
            elif native_frames is None:
                img, lanes = resize_with_lanes(
                    img, lanes, self.cfg.img_h, self.cfg.img_w)
            else:
                sx = self.cfg.img_w / ori_w
                sy = self.cfg.img_h / (ori_h - crop)
                lanes = [l * np.array([sx, sy], np.float32) for l in lanes]
            label = encode_lane_label(
                [list(map(tuple, p[np.argsort(-p[:, 1])])) for p in lanes],
                list(range(len(lanes))),
                self.spec, self.cfg.img_h, self.cfg.img_w, self.cfg.max_lanes,
            )
            imgs.append(self.normalize(img) if img is not None
                        else native_frames[fi])
            labels.append(label)
            points.append(lanes)

        return {
            "name": vid,
            "frames": np.stack(imgs),
            "labels": np.stack(labels),
            "points": points,
            "size": (ori_h - crop, ori_w),  # cropped coordinate frame
            "ori_size": (ori_h, ori_w),
            "crop": crop,
            "frame_names": sample_frames,
        }
