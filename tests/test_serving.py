"""Multi-stream serving wrapper tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phnet_tpu.config import Config
from phnet_tpu.data import synthetic_clip
from phnet_tpu.models import PHNet
from phnet_tpu.serving import StreamingServer

from test_model import tiny_cfg


@pytest.fixture(scope="module")
def server_setup():
    mcfg = tiny_cfg(window=4)
    cfg = Config(model=mcfg)
    model = PHNet(mcfg)
    frames0 = jnp.zeros((2, 1, mcfg.img_h, mcfg.img_w, 3))
    variables = jax.jit(lambda r, f: model.init(r, f, None, train=False))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, frames0)
    return cfg, variables


def test_streaming_server_lifecycle(server_setup):
    cfg, variables = server_setup
    server = StreamingServer(cfg, variables, max_streams=2, memory_window=4)
    s0 = server.attach()
    s1 = server.attach()
    assert (s0, s1) == (0, 1)
    with pytest.raises(RuntimeError):
        server.attach()

    clips = [
        synthetic_clip(seed=i, t=3, img_h=cfg.model.img_h,
                       img_w=cfg.model.img_w, spec=cfg.model.lane,
                       max_lanes=cfg.model.max_lanes)
        for i in range(2)
    ]
    for t in range(3):
        out = server.step({s0: clips[0]["frames"][t],
                           s1: clips[1]["frames"][t]})
        assert set(out.keys()) == {s0, s1}
        for lanes in out.values():
            assert isinstance(lanes, list)
    assert int(server.memory.t) == 3

    # detach clears the slot's memory mask; slot is reusable
    server.detach(s1)
    assert not np.array(server.memory.mask)[s1].any()
    s2 = server.attach()
    assert s2 == s1

    # stepping an unattached stream raises
    server.detach(s0)
    with pytest.raises(AssertionError):
        server.step({s0: clips[0]["frames"][0]})


def test_streaming_server_matches_pipeline(server_setup):
    """Frame-by-frame serving == whole-clip inference for the same stream."""
    cfg, variables = server_setup
    mcfg = cfg.model
    clip = synthetic_clip(seed=7, t=4, img_h=mcfg.img_h, img_w=mcfg.img_w,
                          spec=mcfg.lane, max_lanes=mcfg.max_lanes)

    server = StreamingServer(cfg, variables, max_streams=2, memory_window=4)
    sid = server.attach()
    served = [server.step({sid: clip["frames"][t]})[sid] for t in range(4)]

    from phnet_tpu.pipeline import InferencePipeline
    pipe = InferencePipeline(cfg, variables, chunk=4, memory_window=4)
    pipe._ori_h = 0
    pipe._cut = 0
    whole, _ = pipe.run_video(np.asarray(clip["frames"]))

    for lanes_s, lanes_w in zip(served, whole):
        assert len(lanes_s) == len(lanes_w)
        for a, b in zip(lanes_s, lanes_w):
            np.testing.assert_allclose(a.points, b.points, atol=1e-4)


def test_streaming_server_stats(server_setup):
    cfg, variables = server_setup
    server = StreamingServer(cfg, variables, max_streams=2, memory_window=4)
    s0 = server.attach()
    clip = synthetic_clip(seed=3, t=3, img_h=cfg.model.img_h,
                          img_w=cfg.model.img_w, spec=cfg.model.lane,
                          max_lanes=cfg.model.max_lanes)
    for t in range(3):
        server.step({s0: clip["frames"][t]})
    st = server.stats()
    assert st["ticks"] == 3 and st["frames"] == 3
    assert st["active_streams"] == 1
    assert st["frames_per_stream"][s0] == 3
    assert st["dispatch_ms_p50"] > 0 and st["dispatch_ms_p99"] >= st["dispatch_ms_p50"]

    # a reattached slot must NOT inherit the previous stream's frame count
    server.detach(s0)
    s0b = server.attach()
    assert s0b == s0
    assert server.stats()["frames_per_stream"][s0b] == 0
    server.step({s0b: clip["frames"][0]})
    assert server.stats()["frames_per_stream"][s0b] == 1
    assert server.stats()["frames"] == 4  # lifetime total unaffected


def test_streaming_server_mesh_parity(server_setup):
    """Streams sharded over a 4-wide data mesh == the unsharded server
    (chip-scale request batching: the ROADMAP's multi-chip serving)."""
    from phnet_tpu.parallel import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    cfg, variables = server_setup
    mcfg = cfg.model
    clips = [
        synthetic_clip(seed=20 + i, t=3, img_h=mcfg.img_h, img_w=mcfg.img_w,
                       spec=mcfg.lane, max_lanes=mcfg.max_lanes)
        for i in range(4)
    ]

    mesh = make_mesh(4, model_parallel=1)
    plain = StreamingServer(cfg, variables, max_streams=4, memory_window=4)
    shard = StreamingServer(cfg, variables, max_streams=4, memory_window=4,
                            mesh=mesh)
    with pytest.raises(ValueError):
        StreamingServer(cfg, variables, max_streams=3, memory_window=4,
                        mesh=mesh)

    sids = [plain.attach() for _ in range(4)]
    assert [shard.attach() for _ in range(4)] == sids
    for t in range(3):
        frame = {s: clips[s]["frames"][t] for s in sids}
        out_p = plain.step(dict(frame))
        out_s = shard.step(dict(frame))
        for s in sids:
            assert len(out_p[s]) == len(out_s[s])
            for a, b in zip(out_p[s], out_s[s]):
                np.testing.assert_allclose(a.points, b.points, atol=1e-4)

    # detach on the sharded server keeps the mask's sharding (no recompile)
    shard.detach(sids[1])
    assert not np.array(shard.memory.mask)[sids[1]].any()
    out = shard.step({sids[0]: clips[0]["frames"][0]})
    assert sids[0] in out


def test_streaming_server_skipped_tick_preserves_memory(server_setup):
    """A stream that supplies no frame on a tick must keep its temporal
    state untouched: its batch slot holds a stale frame whose
    re-detections must not be written into memory (serving.py row_mask)."""
    cfg, variables = server_setup
    mcfg = cfg.model
    clips = [
        synthetic_clip(seed=30 + i, t=4, img_h=mcfg.img_h, img_w=mcfg.img_w,
                       spec=mcfg.lane, max_lanes=mcfg.max_lanes)
        for i in range(2)
    ]

    server = StreamingServer(cfg, variables, max_streams=2, memory_window=8)
    s0, s1 = server.attach(), server.attach()

    # tick 0: both streams; ticks 1-2: only s0; tick 3: both again
    server.step({s0: clips[0]["frames"][0], s1: clips[1]["frames"][0]})
    mem_before = jax.tree_util.tree_map(np.array, server.memory)
    server.step({s0: clips[0]["frames"][1]})
    server.step({s0: clips[0]["frames"][2]})
    mem_after = jax.tree_util.tree_map(np.array, server.memory)

    # s1's memory rows are bit-identical across its skipped ticks
    np.testing.assert_array_equal(mem_after.values[s1], mem_before.values[s1])
    np.testing.assert_array_equal(mem_after.mask[s1], mem_before.mask[s1])
    # s0's memory did gain entries over the same ticks
    assert mem_after.mask[s0].sum() >= mem_before.mask[s0].sum()

    # the rejoining tick still serves both streams
    out = server.step({s0: clips[0]["frames"][3], s1: clips[1]["frames"][1]})
    assert set(out.keys()) == {s0, s1}


@pytest.mark.parametrize("use_mesh", [False, True])
def test_streaming_server_skip_ring_wraparound(server_setup, use_mesh):
    """After the ring wraps, a stream that keeps skipping must see its
    over-age entries expire: the jitted step clears the written ring
    position's mask for row_mask==False streams (serving.py), so a skipped
    tick is a genuine hole rather than an immortal stale entry. Runs both
    the plain and the data-mesh-sharded path."""
    cfg, variables = server_setup
    mcfg = cfg.model
    mesh = None
    if use_mesh:
        if len(jax.devices()) < 2:
            pytest.skip("needs 2 virtual devices")
        from phnet_tpu.parallel import make_mesh

        mesh = make_mesh(2, model_parallel=1)

    window = 4
    clips = [
        synthetic_clip(seed=40 + i, t=window + 2, img_h=mcfg.img_h,
                       img_w=mcfg.img_w, spec=mcfg.lane,
                       max_lanes=mcfg.max_lanes)
        for i in range(2)
    ]
    server = StreamingServer(cfg, variables, max_streams=2,
                             memory_window=window, mesh=mesh)
    s0, s1 = server.attach(), server.attach()

    # tick 0: both streams write at ring position 0
    server.step({s0: clips[0]["frames"][0], s1: clips[1]["frames"][0]})
    mask0 = np.array(server.memory.mask)
    # ticks 1..window+1: only s0 — the ring wraps past s1's position-0 entry
    for t in range(1, window + 2):
        server.step({s0: clips[0]["frames"][t]})
    mask = np.array(server.memory.mask)

    # s1's only entry aged out when the ring revisited position 0
    assert not mask[s1].any(), mask[s1]
    # s0 kept writing throughout (every position valid or recently valid)
    assert mask[s0].any()
    # sanity: s1 did have an entry before the wraparound (the test would
    # be vacuous otherwise)
    assert mask0[s1].any()


def test_router_chain_bf16_auto_by_batch(server_setup):
    """The router-chain bf16 flag auto-resolves by batch: None (the config
    default) becomes True past the measured B=8 VMEM spill point and False
    below it; an explicit pin always wins (VERDICT r3 #4)."""
    import dataclasses

    cfg, variables = server_setup
    assert cfg.model.head.router_chain_bf16 is None  # config default = auto

    small = StreamingServer(cfg, variables, max_streams=2, memory_window=4)
    assert small.mcfg.head.router_chain_bf16 is False
    big = StreamingServer(cfg, variables, max_streams=16, memory_window=4)
    assert big.mcfg.head.router_chain_bf16 is True

    pinned = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, head=dataclasses.replace(
            cfg.model.head, router_chain_bf16=False)))
    srv = StreamingServer(pinned, variables, max_streams=16, memory_window=4)
    assert srv.mcfg.head.router_chain_bf16 is False


def test_update_variables_rebuilds_combined_weights(server_setup):
    """Checkpoint hot-reload: swapping weights through update_variables
    must refresh the pre-combined DynamicConv fast path — serving with
    swapped weights must equal a server constructed with them directly
    (ADVICE r4: a bare ``self.variables = ...`` assignment kept serving
    stale combines)."""
    cfg, variables = server_setup
    mcfg = cfg.model
    clip = synthetic_clip(seed=11, t=2, img_h=mcfg.img_h, img_w=mcfg.img_w,
                          spec=mcfg.lane, max_lanes=mcfg.max_lanes)

    model = PHNet(mcfg)
    frames0 = jnp.zeros((2, 1, mcfg.img_h, mcfg.img_w, 3))
    variables2 = jax.jit(lambda r, f: model.init(r, f, None, train=False))(
        {"params": jax.random.key(42), "dropout": jax.random.key(43)},
        frames0)

    swapped = StreamingServer(cfg, variables, max_streams=1, memory_window=4)
    assert swapped._dyn is not None  # the fast path this test protects
    old_dyn = swapped._dyn
    swapped.update_variables(variables2)
    assert swapped._dyn is not old_dyn
    fresh = StreamingServer(cfg, variables2, max_streams=1, memory_window=4)

    sa, sb = swapped.attach(), fresh.attach()
    for t in range(2):
        out_a = swapped.step({sa: clip["frames"][t]})[sa]
        out_b = fresh.step({sb: clip["frames"][t]})[sb]
        assert len(out_a) == len(out_b)
        for la, lb in zip(out_a, out_b):
            np.testing.assert_allclose(la.points, lb.points, atol=1e-5)


def test_streaming_server_packed_frames_parity(server_setup):
    """Width-packed frame ingestion (server packs [H,W,3] -> [H,W/2,6]
    host-side, zero-copy) must produce the same lanes as the unpacked
    whole-clip pipeline with the same weights."""
    import dataclasses

    cfg, _ = server_setup
    mcfg = dataclasses.replace(
        cfg.model, backbone=dataclasses.replace(
            cfg.model.backbone, stem="width_packed"))
    cfg2 = dataclasses.replace(cfg, model=mcfg)
    model = PHNet(mcfg)
    frames0 = jnp.zeros((2, 1, mcfg.img_h, mcfg.img_w, 3))
    variables = jax.jit(lambda r, f: model.init(r, f, None, train=False))(
        {"params": jax.random.key(3), "dropout": jax.random.key(4)}, frames0)

    clip = synthetic_clip(seed=23, t=3, img_h=mcfg.img_h, img_w=mcfg.img_w,
                          spec=mcfg.lane, max_lanes=mcfg.max_lanes)
    server = StreamingServer(cfg2, variables, max_streams=2, memory_window=4)
    assert server._packed  # stem pinned to width_packed engages packing
    sid = server.attach()
    served = [server.step({sid: clip["frames"][t]})[sid] for t in range(3)]

    from phnet_tpu.pipeline import InferencePipeline
    pipe = InferencePipeline(cfg2, variables, chunk=3, memory_window=4)
    pipe._ori_h = 0
    pipe._cut = 0
    whole, _ = pipe.run_video(np.asarray(clip["frames"]))
    for lanes_s, lanes_w in zip(served, whole):
        assert len(lanes_s) == len(lanes_w)
        for a, b in zip(lanes_s, lanes_w):
            np.testing.assert_allclose(a.points, b.points, atol=1e-4)


def test_streaming_server_s2d_packed_parity(server_setup):
    """s2d-packed ingestion (host emits [H/2, W/2, 12] space-to-depth
    frames — the measured-fastest serving ingest) == the unpacked
    pipeline with the same weights."""
    import dataclasses

    cfg, _ = server_setup
    mcfg = dataclasses.replace(
        cfg.model, backbone=dataclasses.replace(
            cfg.model.backbone, stem="space_to_depth"))
    cfg2 = dataclasses.replace(cfg, model=mcfg)
    model = PHNet(mcfg)
    frames0 = jnp.zeros((2, 1, mcfg.img_h, mcfg.img_w, 3))
    variables = jax.jit(lambda r, f: model.init(r, f, None, train=False))(
        {"params": jax.random.key(5), "dropout": jax.random.key(6)}, frames0)

    clip = synthetic_clip(seed=29, t=3, img_h=mcfg.img_h, img_w=mcfg.img_w,
                          spec=mcfg.lane, max_lanes=mcfg.max_lanes)
    server = StreamingServer(cfg2, variables, max_streams=2, memory_window=4)
    assert server._packed == "s2d"
    sid = server.attach()
    served = [server.step({sid: clip["frames"][t]})[sid] for t in range(3)]

    from phnet_tpu.pipeline import InferencePipeline
    pipe = InferencePipeline(cfg2, variables, chunk=3, memory_window=4)
    pipe._ori_h = 0
    pipe._cut = 0
    whole, _ = pipe.run_video(np.asarray(clip["frames"]))
    for lanes_s, lanes_w in zip(served, whole):
        assert len(lanes_s) == len(lanes_w)
        for a, b in zip(lanes_s, lanes_w):
            np.testing.assert_allclose(a.points, b.points, atol=1e-4)


def test_pin_frame_layout_parity(server_setup):
    """``pin_frame_layout=True`` (compiled step with an AUTO input
    Format, frame buffer + scatter held in the compiler's preferred
    layout — kills the per-tick relayout copy on TPU) must serve
    identical lanes to the default unpinned path, including across a
    weight hot-swap (which re-pins) and a skipped tick."""
    cfg, variables = server_setup
    clip = synthetic_clip(seed=31, t=4, img_h=cfg.model.img_h,
                          img_w=cfg.model.img_w, spec=cfg.model.lane,
                          max_lanes=cfg.model.max_lanes)

    def serve(pin):
        server = StreamingServer(cfg, variables, max_streams=2,
                                 memory_window=4, pin_frame_layout=pin)
        sid = server.attach()
        out = []
        for t in range(3):
            out.append(server.step({sid: clip["frames"][t]})[sid])
        server.step({})  # skipped tick exercises the pinned donate path
        server.update_variables(variables)  # same structure: key reuse
        out.append(server.step({sid: clip["frames"][3]})[sid])
        return out

    ref, pinned = serve(False), serve(True)
    for lanes_a, lanes_b in zip(ref, pinned):
        assert len(lanes_a) == len(lanes_b)
        for a, b in zip(lanes_a, lanes_b):
            np.testing.assert_allclose(a.points, b.points, atol=1e-4)
