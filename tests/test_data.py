"""Dataset reader tests against synthesized on-disk fixtures that mirror the
reference directory schemas (dataV3.py / datasetOL.py)."""

import json
import os
import pickle

import cv2
import numpy as np
import pytest
import yaml

from phnet_tpu.config import DataConfig, LaneSpec
from phnet_tpu.data import ClipLoader, TrainAugment
from phnet_tpu.data.openlane import OpenLaneDataset
from phnet_tpu.data.vil100 import VIL100Dataset


def lane_points(x0, slope, ori_h, n=12, y_top_frac=0.45):
    ys = np.linspace(ori_h - 5, ori_h * y_top_frac, n)
    return [[float(x0 + slope * (ori_h - y)), float(y)] for y in ys]


@pytest.fixture
def vil_tree(tmp_path):
    root = tmp_path / "dataset"
    ori_h, ori_w = 480, 960
    videos = {"0_Road001_Trim001": "train", "1_Road002_Trim002": "test"}
    db = {"sequences": [{"name": v, "set": s} for v, s in videos.items()]}
    (root / "VIL100" / "data").mkdir(parents=True)
    with open(root / "VIL100" / "data" / "db_info.yaml", "w") as f:
        yaml.safe_dump(db, f)
    for vid in videos:
        for d in ("JPEGImages", "Annotations", "Json"):
            (root / "VIL100" / d / vid).mkdir(parents=True)
        for i in range(4):
            name = f"{i:05d}"
            img = np.full((ori_h, ori_w, 3), 90, np.uint8)
            cv2.imwrite(str(root / "VIL100" / "JPEGImages" / vid / f"{name}.jpg"), img)
            mask = np.zeros((ori_h, ori_w), np.uint8)
            mask[-50:, :100] = 1
            cv2.imwrite(str(root / "VIL100" / "Annotations" / vid / f"{name}.png"), mask)
            anno = {
                "info": {"height": ori_h, "width": ori_w},
                "annotations": {"lane": [
                    {"lane_id": 1, "occlusion": 0,
                     "points": lane_points(300 + 3 * i, 0.2, ori_h)},
                    {"lane_id": 2, "occlusion": 1,
                     "points": lane_points(650 - 3 * i, -0.1, ori_h)},
                ]},
            }
            with open(root / "VIL100" / "Json" / vid / f"{name}.jpg.json", "w") as f:
                json.dump(anno, f)
    return str(root), (ori_h, ori_w)


def test_vil_dataset_reader(vil_tree):
    root, (ori_h, ori_w) = vil_tree
    cfg = DataConfig(root=root, img_h=96, img_w=192, cut_scale=0.35, max_lanes=8)
    spec = LaneSpec(n_offsets=36, n_lengths=2)
    ds = VIL100Dataset(cfg, spec, train=True, sampled_frames=3,
                       samples_per_video=2)
    assert len(ds) == 2  # one train video x 2 samples
    clip = ds[0]
    assert clip["frames"].shape == (3, 96, 192, 3)
    assert clip["labels"].shape == (3, 8, spec.dim)
    # both lanes encoded valid in every frame
    np.testing.assert_array_equal(clip["labels"][:, :2, 1], 1.0)
    np.testing.assert_array_equal(clip["labels"][:, 2:, 1], 0.0)
    assert clip["size"] == (ori_h, ori_w)
    assert clip["cut"] == int(ori_h * 0.35)
    # normalized frames
    assert abs(float(clip["frames"].mean())) < 3.0

    # curriculum plumbing
    ds.increase_max_skip()
    assert ds.max_skip == 5 + 5
    ds.set_max_skip(3)
    assert ds.max_skip == 3

    # test split: whole video, no augmentation
    ds_test = VIL100Dataset(cfg, spec, train=False)
    clip_t = ds_test[0]
    assert clip_t["frames"].shape[0] == 4
    assert clip_t["name"] == "1_Road002_Trim002"


def test_vil_dataset_with_augment(vil_tree):
    root, _ = vil_tree
    cfg = DataConfig(root=root, img_h=96, img_w=192, cut_scale=0.35, max_lanes=8)
    spec = LaneSpec(36, 2)
    aug = TrainAugment(img_h=96, img_w=192, rng=np.random.default_rng(0),
                       p_affine=1.0, p_hflip=1.0)
    ds = VIL100Dataset(cfg, spec, train=True, sampled_frames=2,
                       samples_per_video=1, augment=aug)
    clip = ds[0]
    assert clip["frames"].shape == (2, 96, 192, 3)
    assert np.isfinite(clip["labels"]).all()


def test_augment_keeps_ids_aligned_when_lane_dropped():
    """A lane clipped out mid-list must drop its own id, not shift the
    tail ids (reference keys label rows by lane_id, transformV4.py:183-216)."""
    aug = TrainAugment(img_h=96, img_w=192, rng=np.random.default_rng(0),
                       p_hflip=0, p_channel_shuffle=0, p_brightness=0,
                       p_hue_sat=0, p_blur=0, p_affine=0)
    img = np.zeros((96, 192, 3), np.uint8)
    good = np.array([[50.0, 90.0], [60.0, 40.0]], np.float32)
    outside = np.array([[-50.0, 90.0], [-60.0, 40.0]], np.float32)
    good2 = np.array([[150.0, 90.0], [140.0, 40.0]], np.float32)
    _, lanes, ids = aug(img, [good, outside, good2], ids=[7, 8, 9])
    assert ids == [7, 9]
    assert len(lanes) == 2
    np.testing.assert_allclose(lanes[1][:, 0], [150.0, 140.0])
    # ids=None keeps the 2-tuple return for positional callers
    _, lanes2 = aug(img, [good, outside, good2])
    assert len(lanes2) == 2


def test_vil_lane_ids_survive_clipped_middle_lane(vil_tree, tmp_path):
    """Regression for the lane-id misalignment: when augmentation drops a
    *middle* lane, the surviving lanes must keep their own label rows."""
    root, (ori_h, ori_w) = vil_tree
    vid = "0_Road001_Trim001"
    jdir = os.path.join(root, "VIL100", "Json", vid)
    cut = int(ori_h * 0.35)
    # lane_id 2's points all sit above the crop line -> clipped away by
    # the augment pipeline; lane_ids 1 and 3 survive.
    sky = [[float(400 + 2 * k), float(20 + 10 * k)] for k in range(5)]
    assert max(p[1] for p in sky) < cut
    for name in sorted(os.listdir(jdir)):
        with open(os.path.join(jdir, name)) as f:
            anno = json.load(f)
        lanes = anno["annotations"]["lane"]
        lanes[1]["lane_id"] = 3  # original middle lane becomes id 3
        lanes.insert(1, {"lane_id": 2, "occlusion": 0, "points": sky})
        with open(os.path.join(jdir, name), "w") as f:
            json.dump(anno, f)

    cfg = DataConfig(root=root, img_h=96, img_w=192, cut_scale=0.35, max_lanes=8)
    spec = LaneSpec(36, 2)
    aug = TrainAugment(img_h=96, img_w=192, rng=np.random.default_rng(0),
                       p_hflip=0, p_channel_shuffle=0, p_brightness=0,
                       p_hue_sat=0, p_blur=0, p_affine=0)
    ds = VIL100Dataset(cfg, spec, train=True, sampled_frames=2,
                       samples_per_video=1, augment=aug)
    labels = ds[0]["labels"]
    # rows 0 and 2 (lane_ids 1 and 3) valid; row 1 (dropped lane) empty
    np.testing.assert_array_equal(labels[:, 0, 1], 1.0)
    np.testing.assert_array_equal(labels[:, 1, 1], 0.0)
    np.testing.assert_array_equal(labels[:, 2, 1], 1.0)
    # the surviving lane 3 really is the right-hand lane (x ~ 650/960 scale)
    xs = labels[0, 2, spec.col_xs:]
    valid_xs = xs[xs > -1e4]
    assert valid_xs.size > 0 and valid_xs.mean() > 96  # right half of 192px


def test_vil_dataset_loads_seg_and_flow(vil_tree):
    """load_seg/load_flow planes come back clip-shaped and co-augmented
    (flow jpgs per dataV3.py:168-176 quantization)."""
    root, (ori_h, ori_w) = vil_tree
    vid = "0_Road001_Trim001"
    fdir = os.path.join(root, "VIL100", "Flow", vid)
    os.makedirs(fdir, exist_ok=True)
    for i in range(4):
        name = f"{i:05d}"
        cv2.imwrite(os.path.join(fdir, name + "u.jpg"),
                    np.full((ori_h, ori_w), 200, np.uint8))
        cv2.imwrite(os.path.join(fdir, name + "v.jpg"),
                    np.full((ori_h, ori_w), 55, np.uint8))

    cfg = DataConfig(root=root, img_h=96, img_w=192, cut_scale=0.35,
                     max_lanes=8)
    spec = LaneSpec(36, 2)
    aug = TrainAugment(img_h=96, img_w=192, rng=np.random.default_rng(0),
                       p_affine=1.0)
    ds = VIL100Dataset(cfg, spec, train=True, sampled_frames=2,
                       samples_per_video=1, augment=aug,
                       load_seg=True, load_flow=True)
    clip = ds[0]
    assert clip["seg"].shape == (2, 96, 192)
    assert clip["flow"].shape == (2, 96, 192, 2)
    # u=200 quantized -> positive u; v=55 -> negative v (bound scaling)
    interior = clip["flow"][:, 20:70, 40:150]
    assert interior[..., 0].mean() > 0
    assert interior[..., 1].mean() < 0


def test_native_clip_loader(tmp_path):
    """Native C++ decode+crop+resize+normalize matches the cv2 path
    (skip when the toolchain can't build the .so)."""
    from phnet_tpu.data import native_loader

    if not native_loader.native_available():
        pytest.skip("native clip loader unavailable")
    from phnet_tpu.data.transforms import Normalize

    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        img = cv2.GaussianBlur(
            rng.integers(0, 255, (200, 400, 3), np.uint8), (5, 5), 2)
        p = str(tmp_path / f"{i}.jpg")
        cv2.imwrite(p, img)
        paths.append(p)
    cut, h, w = 70, 96, 192
    out = native_loader.decode_clip(paths, cut, h, w)
    assert out.shape == (3, h, w, 3) and out.dtype == np.float32

    norm = Normalize()
    ref = []
    for p in paths:
        im = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)[cut:]
        ref.append(norm(cv2.resize(im, (w, h))))
    ref = np.stack(ref)
    # JPEG IDCT + resize rounding differ slightly between decoders
    assert np.abs(out - ref).mean() < 0.02
    assert np.abs(out - ref).max() < 0.2

    gray = native_loader.decode_clip_gray(paths, 0, 50, 100)
    assert gray.shape == (3, 50, 100)

    # s2d emission == exact 2x2 space-to-depth of the NHWC decode (the
    # serving ingest layout, ModelConfig.packed_frames="s2d")
    s2d = native_loader.decode_clip_s2d(paths, cut, h, w)
    assert s2d.shape == (3, h // 2, w // 2, 12)
    want = out.reshape(3, h // 2, 2, w // 2, 2, 3).transpose(
        0, 1, 3, 2, 4, 5).reshape(3, h // 2, w // 2, 12)
    np.testing.assert_array_equal(s2d, want)

    with pytest.raises(IOError):
        native_loader.decode_clip([str(tmp_path / "missing.jpg")], 0, 8, 8)


def test_vil_dataset_native_decode(vil_tree):
    """Reader's native fast path produces the same labels and near-equal
    frames as the cv2 path on the test split."""
    from phnet_tpu.data import native_loader

    if not native_loader.native_available():
        pytest.skip("native clip loader unavailable")
    root, _ = vil_tree
    cfg = DataConfig(root=root, img_h=96, img_w=192, cut_scale=0.35,
                     max_lanes=8)
    spec = LaneSpec(36, 2)
    ds_cv = VIL100Dataset(cfg, spec, train=False, native_decode="never")
    ds_nat = VIL100Dataset(cfg, spec, train=False, native_decode="always")
    a, b = ds_cv[0], ds_nat[0]
    np.testing.assert_array_equal(a["labels"], b["labels"])
    assert np.abs(a["frames"] - b["frames"]).mean() < 0.02


def test_clip_interpolates_border_crossings():
    """imgaug clip_out_of_image_ keeps the in-image part of a segment that
    crosses the border, with the crossing point ON the border — not just
    the in-image vertices (transformV4.py:246)."""
    from phnet_tpu.data.transforms import _clip_lanes

    # one segment from inside to far outside the right edge
    lane = np.array([[100.0, 50.0], [300.0, 90.0]], np.float32)
    lanes, ids = _clip_lanes([lane], h=96, w=192, ids=[4])
    assert ids == [4]
    (pts,) = lanes
    np.testing.assert_allclose(pts[0], [100.0, 50.0], atol=1e-4)
    # exit point interpolated onto x = w boundary, y on the segment
    assert abs(pts[-1][0] - 192.0) < 1e-2
    expect_y = 50.0 + (192.0 - 100.0) / (300.0 - 100.0) * (90.0 - 50.0)
    assert abs(pts[-1][1] - expect_y) < 1e-2

    # exits and re-enters: the longer in-image piece is kept
    zig = np.array([[10.0, 50.0], [-50.0, 55.0], [-40.0, 60.0],
                    [20.0, 65.0], [80.0, 70.0], [120.0, 80.0]], np.float32)
    lanes2, _ = _clip_lanes([zig], h=96, w=192, ids=[0])
    assert len(lanes2) == 1
    assert (lanes2[0][:, 0] >= 0).all() and (lanes2[0][:, 0] <= 192).all()
    assert len(lanes2[0]) >= 4  # the re-entry run has the most points


def test_augment_cotransforms_seg_and_flow():
    """Seg masks and flow planes must ride the same geometric ops as the
    image (reference passes them as SegmentationMaps/Heatmaps through one
    imgaug call, transformV4.py:236-246)."""
    rng = np.random.default_rng(1)
    aug = TrainAugment(img_h=96, img_w=192, rng=rng, p_hflip=1.0,
                       p_channel_shuffle=0, p_brightness=0, p_hue_sat=0,
                       p_blur=0, p_affine=0)
    img = np.zeros((200, 400, 3), np.uint8)
    img[:, :40] = 255  # bright band on the LEFT
    seg = np.zeros((200, 400), np.uint8)
    seg[:, :40] = 3
    flow = np.zeros((200, 400, 2), np.float32)
    flow[:, :40, 0] = 0.5
    lane = np.array([[30.0, 180.0], [35.0, 60.0]], np.float32)
    out_img, lanes, ids, out_seg, out_flow = aug(
        img, [lane], ids=[0], seg=seg, flow=flow)
    assert out_seg.shape == (96, 192)
    assert out_flow.shape == (96, 192, 2)
    # hflip moved the band to the RIGHT in all three planes, and the lane
    assert out_img[:, -10:].mean() > 200 and out_img[:, :10].mean() < 50
    assert (out_seg[:, -10:] == 3).mean() > 0.9
    assert out_flow[:, -10:, 0].mean() > 0.4
    assert lanes[0][:, 0].mean() > 96


def test_augment_affine_keeps_seg_aligned():
    """Affine must move the seg mask exactly with the pixels."""
    rng = np.random.default_rng(3)
    aug = TrainAugment(img_h=96, img_w=192, rng=rng, p_hflip=0,
                       p_channel_shuffle=0, p_brightness=0, p_hue_sat=0,
                       p_blur=0, p_affine=1.0)
    img = np.zeros((96, 192, 3), np.uint8)
    img[40:60, 80:120] = 255
    seg = np.zeros((96, 192), np.uint8)
    seg[40:60, 80:120] = 1
    out_img, _, out_seg = aug(img, [], seg=seg)
    bright = out_img[..., 0] > 128
    marked = out_seg == 1
    inter = (bright & marked).sum()
    union = (bright | marked).sum()
    assert union > 0 and inter / union > 0.9


@pytest.fixture
def ol_tree(tmp_path):
    root = tmp_path / "dataset"
    ori_h, ori_w = 1280, 1920
    for mode in ("training", "validation"):
        for vid in ("segment-001", "segment-002"):
            (root / "OpenLane" / "images" / mode / vid).mkdir(parents=True)
            (root / "OpenLane" / "OpenLane-V" / "label" / mode / vid).mkdir(
                parents=True)
            for i in range(3):
                name = f"15{i:07d}"
                img = np.full((ori_h, ori_w, 3), 80, np.uint8)
                cv2.imwrite(str(root / "OpenLane" / "images" / mode / vid /
                                f"{name}.jpg"), img)
                lanes = {"lanes": [
                    np.array(lane_points(700 + 5 * i, 0.15, ori_h, y_top_frac=0.5)),
                    np.array(lane_points(1200, -0.1, ori_h, y_top_frac=0.5)),
                ]}
                with open(root / "OpenLane" / "OpenLane-V" / "label" / mode /
                          vid / f"{name}.pickle", "wb") as f:
                    pickle.dump(lanes, f)
    return str(root), (ori_h, ori_w)


def test_openlane_dataset_reader(ol_tree):
    root, (ori_h, ori_w) = ol_tree
    cfg = DataConfig(root=root, img_h=96, img_w=192, crop_size=480, max_lanes=4)
    spec = LaneSpec(n_offsets=24, n_lengths=1)
    ds = OpenLaneDataset(cfg, spec, train=True, sampled_frames=2)
    assert len(ds) == 2
    clip = ds[0]
    assert clip["frames"].shape == (2, 96, 192, 3)
    assert clip["labels"].shape == (2, 4, spec.dim)
    assert clip["labels"][0, :2, 1].sum() == 2.0
    assert clip["size"] == (ori_h - 480, ori_w)
    assert clip["crop"] == 480

    ds_val = OpenLaneDataset(cfg, spec, train=False)
    clip_v = ds_val[0]
    assert clip_v["frames"].shape[0] == 3  # whole video


def test_openlane_dataset_native_decode(ol_tree):
    from phnet_tpu.data import native_loader

    if not native_loader.native_available():
        pytest.skip("native clip loader unavailable")
    root, _ = ol_tree
    cfg = DataConfig(root=root, img_h=96, img_w=192, crop_size=480, max_lanes=4)
    spec = LaneSpec(n_offsets=24, n_lengths=1)
    a = OpenLaneDataset(cfg, spec, train=False, native_decode="never")[0]
    b = OpenLaneDataset(cfg, spec, train=False, native_decode="always")[0]
    np.testing.assert_array_equal(a["labels"], b["labels"])
    assert a["size"] == b["size"] and a["crop"] == b["crop"]
    assert np.abs(a["frames"] - b["frames"]).mean() < 0.02


def test_clip_loader_sharding(vil_tree):
    root, _ = vil_tree
    cfg = DataConfig(root=root, img_h=96, img_w=192, cut_scale=0.35, max_lanes=8)
    spec = LaneSpec(36, 2)
    ds = VIL100Dataset(cfg, spec, train=True, sampled_frames=2,
                       samples_per_video=4)
    loader0 = ClipLoader(ds, batch_size=1, num_shards=2, shard_index=0,
                         prefetch=0, seed=1)
    loader1 = ClipLoader(ds, batch_size=1, num_shards=2, shard_index=1,
                         prefetch=0, seed=1)
    b0 = [b["frames"].shape for b in loader0]
    b1 = [b["frames"].shape for b in loader1]
    assert len(b0) == len(b1) == 2  # 4 samples / 2 shards
    batch = next(iter(loader0))
    assert batch["frames"].shape == (1, 2, 96, 192, 3)
    assert batch["labels"].shape == (1, 2, 8, spec.dim)
    assert "name" in batch["infos"][0]


def test_vil_flow_missing_frame_stays_aligned(vil_tree):
    """A frame whose flow jpgs are missing gets zero flow instead of being
    dropped — dropping would shift every later frame's flow row off its
    image (silent misalignment under load_flow=True)."""
    root, (ori_h, ori_w) = vil_tree
    vid = "1_Road002_Trim002"  # the test-split video (whole-video read)
    fdir = os.path.join(root, "VIL100", "Flow", vid)
    os.makedirs(fdir, exist_ok=True)
    # flow for frames 0 and 2 only; frames 1 and 3 have no flow jpgs
    for i in (0, 2):
        name = f"{i:05d}"
        cv2.imwrite(os.path.join(fdir, name + "u.jpg"),
                    np.full((ori_h, ori_w), 200, np.uint8))
        cv2.imwrite(os.path.join(fdir, name + "v.jpg"),
                    np.full((ori_h, ori_w), 200, np.uint8))

    cfg = DataConfig(root=root, img_h=96, img_w=192, cut_scale=0.35,
                     max_lanes=8)
    spec = LaneSpec(36, 2)
    ds = VIL100Dataset(cfg, spec, train=False, load_flow=True)
    clip = ds[0]  # test split: whole video, all 4 frames in order
    # all frames present and aligned: 0 and 2 carry real flow, 1/3 zero
    assert clip["flow"].shape[0] == clip["frames"].shape[0] == 4
    assert np.abs(clip["flow"][0]).max() > 0
    assert np.abs(clip["flow"][2]).max() > 0
    np.testing.assert_array_equal(clip["flow"][1], 0.0)
    np.testing.assert_array_equal(clip["flow"][3], 0.0)


def test_openlane_jpeg_dims(tmp_path):
    """_jpeg_dims reads (h, w) from the SOF header without decoding, for
    plain and progressive JPEGs, and falls back to cv2 on non-JPEG data."""
    from phnet_tpu.data.openlane import _jpeg_dims

    img = np.random.default_rng(0).integers(
        0, 255, size=(123, 217, 3)).astype(np.uint8)
    p1 = str(tmp_path / "plain.jpg")
    cv2.imwrite(p1, img)
    assert _jpeg_dims(p1) == (123, 217)
    p2 = str(tmp_path / "prog.jpg")
    cv2.imwrite(p2, img, [cv2.IMWRITE_JPEG_PROGRESSIVE, 1])
    assert _jpeg_dims(p2) == (123, 217)
    p3 = str(tmp_path / "actually.png")
    cv2.imwrite(p3, img[:50, :60])
    assert _jpeg_dims(p3) == (50, 60)  # cv2 fallback
