"""AOT export artifacts: serialize → reload → exact-parity ticks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phnet_tpu.config import Config
from phnet_tpu.data import synthetic_clip
from phnet_tpu.export import DeployedServer, export_serving_step
from phnet_tpu.models import PHNet
from phnet_tpu.serving import StreamingServer

from test_model import tiny_cfg


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    mcfg = tiny_cfg(window=4)
    cfg = Config(model=mcfg)
    model = PHNet(mcfg)
    frames0 = jnp.zeros((2, 1, mcfg.img_h, mcfg.img_w, 3))
    variables = jax.jit(lambda r, f: model.init(r, f, None, train=False))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, frames0)
    art = str(tmp_path_factory.mktemp("artifact"))
    export_serving_step(mcfg, variables, art, batch=2, memory_window=4)
    return cfg, variables, art


def test_artifact_files(exported):
    import os
    _, _, art = exported
    for f in ("step.jaxexport", "params.npz", "memory.npz", "manifest.json"):
        assert os.path.exists(os.path.join(art, f)), f


def test_deployed_matches_streaming_server(exported):
    """The deserialized StableHLO step must tick identically to the live
    StreamingServer (same weights, same memory carry) over several frames."""
    cfg, variables, art = exported
    mcfg = cfg.model
    server = StreamingServer(cfg, variables, max_streams=2, memory_window=4)
    # distinct per-stream original-image geometry: the deployed decode must
    # honour it per batch row exactly like the live server's attach-time geo
    geos = [(240, 80), (360, 0)]
    sids = [server.attach(ori_img_h=h, cut_height=c) for h, c in geos]
    deployed = DeployedServer(art)
    assert deployed.manifest["memory_class"] == "MemoryState"

    clips = [
        synthetic_clip(seed=7 + i, t=4, img_h=mcfg.img_h, img_w=mcfg.img_w,
                       spec=mcfg.lane, max_lanes=mcfg.max_lanes)
        for i in range(2)
    ]
    for t in range(4):
        frames = np.stack([clips[i]["frames"][t] for i in range(2)])
        kept_d, valid_d = deployed.tick(frames)
        kept_s, valid_s, s_order = server.step_async(
            {sids[i]: frames[i] for i in range(2)})
        np.testing.assert_array_equal(valid_d, np.array(valid_s))
        np.testing.assert_allclose(
            kept_d, np.array(kept_s), rtol=1e-5, atol=1e-5)
        # manifest-driven decode == live-server decode (per-stream geometry)
        lanes_d = deployed.decode(
            kept_d, valid_d, ori_img_h=[g[0] for g in geos],
            cut_height=[g[1] for g in geos])
        lanes_s = server.decode(kept_s, valid_s, s_order)
        for i in range(2):
            assert len(lanes_d[i]) == len(lanes_s[sids[i]])
            for a, b in zip(lanes_d[i], lanes_s[sids[i]]):
                np.testing.assert_allclose(a.points, b.points, atol=1e-5)

    # memory advanced and is restorable
    assert int(np.asarray(deployed.memory[-1])) == 4  # ring counter t
    deployed.reset()
    assert int(np.asarray(deployed.memory[-1])) == 0


def test_export_ol_layout(tmp_path):
    """Single-length (OpenLane) lane layout: export, reload, tick, and
    decode through the extend_bottom branch."""
    mcfg = tiny_cfg(window=4, n_lengths=1)
    model = PHNet(mcfg)
    frames0 = jnp.zeros((1, 1, mcfg.img_h, mcfg.img_w, 3))
    variables = jax.jit(lambda r, f: model.init(r, f, None, train=False))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, frames0)
    art = str(tmp_path / "art_ol")
    export_serving_step(mcfg, variables, art, batch=1, memory_window=4)
    dep = DeployedServer(art)
    assert dep.manifest["lane_spec"]["n_lengths"] == 1
    frame = np.zeros((mcfg.img_h, mcfg.img_w, 3), np.float32)
    kept, valid = dep.tick(frame)
    lanes = dep.decode(kept, valid)
    assert len(lanes) == 1 and isinstance(lanes[0], list)


@pytest.mark.parametrize("mode", ["int8", "w8"])
def test_export_quantized_artifact(tmp_path, mode):
    """Both quantized serving graphs (w8a8 s8 dot_generals and weight-only
    int8 dequant) must survive the export/deserialize roundtrip and tick."""
    import dataclasses

    mcfg = dataclasses.replace(tiny_cfg(window=4), quantize=mode)
    model = PHNet(mcfg)
    frames0 = jnp.zeros((1, 1, mcfg.img_h, mcfg.img_w, 3))
    variables = jax.jit(lambda r, f: model.init(r, f, None, train=False))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, frames0)
    art = str(tmp_path / "art_int8")
    export_serving_step(mcfg, variables, art, batch=1, memory_window=4)
    dep = DeployedServer(art)
    clip = synthetic_clip(seed=11, t=2, img_h=mcfg.img_h, img_w=mcfg.img_w,
                          spec=mcfg.lane, max_lanes=mcfg.max_lanes)
    for t in range(2):
        kept, valid = dep.tick(clip["frames"][t])
    assert kept.shape[0] == 1 and valid.dtype == bool


def test_deployed_variables_roundtrip(exported):
    """params.npz must reproduce the full variables pytree exactly."""
    _, variables, art = exported
    deployed = DeployedServer(art)
    flat_a = jax.tree_util.tree_leaves_with_path(jax.device_get(variables))
    flat_b = jax.tree_util.tree_leaves_with_path(deployed.variables)
    assert len(flat_a) == len(flat_b)
    for (pa, a), (pb, b) in zip(sorted(flat_a, key=lambda kv: str(kv[0])),
                                sorted(flat_b, key=lambda kv: str(kv[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_packed_ingest_matches_live(tmp_path):
    """Exporting with a packed-capable stem serializes the PACKED tick
    (manifest records it); DeployedServer packs raw [H, W, 3] frames
    host-side and matches the live (also packed) StreamingServer."""
    import dataclasses

    mcfg = dataclasses.replace(
        tiny_cfg(window=4), backbone=dataclasses.replace(
            tiny_cfg(window=4).backbone, stem="space_to_depth"))
    cfg = Config(model=mcfg)
    model = PHNet(mcfg)
    frames0 = jnp.zeros((1, 1, mcfg.img_h, mcfg.img_w, 3))
    variables = jax.jit(lambda r, f: model.init(r, f, None, train=False))(
        {"params": jax.random.key(11), "dropout": jax.random.key(12)},
        frames0)
    art = str(tmp_path / "art_packed")
    export_serving_step(mcfg, variables, art, batch=1, memory_window=4)
    dep = DeployedServer(art)
    assert dep.manifest["packed"] == "s2d"

    server = StreamingServer(cfg, variables, max_streams=1, memory_window=4)
    assert server._packed == "s2d"
    sid = server.attach()
    clip = synthetic_clip(seed=31, t=3, img_h=mcfg.img_h, img_w=mcfg.img_w,
                          spec=mcfg.lane, max_lanes=mcfg.max_lanes)
    for t in range(3):
        kept_d, valid_d = dep.tick(clip["frames"][t][None])
        kept_s, valid_s, _ = server.step_async({sid: clip["frames"][t]})
        np.testing.assert_array_equal(valid_d, np.array(valid_s))
        np.testing.assert_allclose(kept_d, np.array(kept_s),
                                   rtol=1e-5, atol=1e-5)
