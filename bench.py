"""Benchmark: streaming VIL-100 inference + training economics on one chip.

Mirrors the reference timing protocol (``testVIL.py:99-130``: whole
100-frame video through the model in ONE call, fps = T / wall — chunked
streaming with carried memory is available in test_vil.py but the bench
uses the reference's whole-video protocol). Additionally measured:

* p50/p99 per-frame latency: a chunk=1 graph driven frame by frame with a
  host sync per frame — the serving-latency number (BASELINE.md names p50
  first-class);
* MFU: XLA cost-analysis FLOPs of a single-frame graph x measured fps /
  197 TF/s (v5e bf16 peak);
* train_fps: one full-size 16-frame clip through the jitted train step
  (forward + criterion + backward + AdamW), the reference's DDP-iteration
  unit (``trainVIL.py:238-253``).

Prints ONE JSON line with the headline throughput; the extra measurements
ride along as additional keys.
"""

import dataclasses
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

V5E_BF16_PEAK = 197e12

# The axon tunnel to the real chip sporadically hangs for minutes (even a
# trivial matmul blocks, see utils/profiler.py). A hang inside the one
# measurement run the driver makes would record nothing — so the parent
# process re-execs itself as a timed child and retries a stalled/crashed
# attempt. The child prints the usual single JSON line; the parent forwards
# the first successful one.
_CHILD_ENV = "PHNET_BENCH_CHILD"
_ATTEMPT_TIMEOUT_S = int(os.environ.get("PHNET_BENCH_TIMEOUT", "2400"))
_ATTEMPTS = int(os.environ.get("PHNET_BENCH_ATTEMPTS", "3"))


def _supervise() -> int:
    env = dict(os.environ, **{_CHILD_ENV: "1"})
    for attempt in range(_ATTEMPTS):
        try:
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, stdout=subprocess.PIPE, timeout=_ATTEMPT_TIMEOUT_S)
        except subprocess.TimeoutExpired:
            print(f"bench attempt {attempt + 1} timed out after "
                  f"{_ATTEMPT_TIMEOUT_S}s (tunnel stall?), retrying",
                  file=sys.stderr)
            continue
        out = res.stdout.decode()
        line = next((ln for ln in out.splitlines()
                     if ln.startswith("{") and '"metric"' in ln), None)
        if res.returncode == 0 and line:
            print(line)
            return 0
        print(f"bench attempt {attempt + 1} failed rc={res.returncode}\n"
              f"{out[-2000:]}", file=sys.stderr)
    return 1


def main():
    t_bench_start = time.time()
    import jax

    if os.environ.get("PHNET_BENCH_CPU"):
        # smoke-test the bench protocol without a TPU; the env var
        # JAX_PLATFORMS is overridden by the environment's sitecustomize,
        # so the platform must be forced on jax.config before first use
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from phnet_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from phnet_tpu.config import TrainConfig, vil100_config
    from phnet_tpu.models import PHNet
    from phnet_tpu.models.phnet import init_memory

    # bf16 matmuls + Pallas NMS/router (auto on TPU) + partial scan unroll
    cfg = dataclasses.replace(
        vil100_config().model, compute_dtype="bfloat16", scan_unroll=5,
        # PHNET_BENCH_INT8=1 A/Bs the w8a8 serving path; or set
        # PHNET_BENCH_QUANTIZE={int8,w8} directly (ops/quant.py)
        quantize=os.environ.get(
            "PHNET_BENCH_QUANTIZE",
            "int8" if os.environ.get("PHNET_BENCH_INT8") else "none"))
    if cfg.quantize not in ("none", "int8", "w8"):
        raise SystemExit(
            "PHNET_BENCH_QUANTIZE must be one of none/int8/w8, got %r"
            % (cfg.quantize,))
    model = PHNet(cfg)

    video_frames = 100  # VIL-100 clip length
    chunk = 100  # whole video per call, as testVIL.py does
    n_videos = 5

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.normal(size=(1, chunk, cfg.img_h, cfg.img_w, 3)).astype(np.float32)
    )

    variables = jax.jit(lambda r, f: model.init(r, f, None, train=False))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, frames
    )

    def run_chunk(variables, frames, mem):
        outs, mem = model.apply(variables, frames, None, train=False,
                                initial_memory=mem)
        return outs.kept, outs.num_kept, mem

    run_chunk = jax.jit(run_chunk)

    # ---- throughput (reference protocol: whole video, sync per video) ----
    mem = init_memory(cfg, 1, video_frames)
    kept, nk, mem = run_chunk(variables, frames, mem)
    np.array(nk)  # force full sync

    times = []
    for _ in range(n_videos):
        mem = init_memory(cfg, 1, video_frames)
        t0 = time.time()
        for _c in range(video_frames // chunk):
            kept, nk, mem = run_chunk(variables, frames, mem)
        np.array(nk)  # device->host sync at end of video, as testVIL does
        times.append(time.time() - t0)
    fps = n_videos * video_frames / sum(times)
    frame_ms_amortized = sum(times) / (n_videos * video_frames) * 1000.0

    # ---- device-step latency: back-to-back chunks, ONE final sync -------
    # frame_ms_amortized above pays one host->device round trip per video
    # (large under the axon dev tunnel); this key pipelines n_videos worth
    # of dispatches with carried memory and syncs once, so it approaches
    # the pure device time per frame and stays comparable across rounds
    # even if the tunnel fixture changes.
    kept, nk, mem = run_chunk(variables, frames, mem)
    np.array(nk)
    t0 = time.time()
    for _ in range(n_videos):
        kept, nk, mem = run_chunk(variables, frames, mem)
    np.array(nk)
    device_frame_ms = (time.time() - t0) / (n_videos * video_frames) * 1000.0

    # ---- p50/p99 per-frame latency (chunk=1, sync every frame) ----------
    frame1 = frames[:, :1]
    run1 = jax.jit(run_chunk)
    mem = init_memory(cfg, 1, video_frames)
    kept, nk, mem = run1(variables, frame1, mem)
    np.array(nk)
    lat = []
    mem = init_memory(cfg, 1, video_frames)
    for _ in range(120):
        t0 = time.time()
        kept, nk, mem = run1(variables, frame1, mem)
        np.array(nk)
        lat.append((time.time() - t0) * 1000)
    lat = np.array(lat[10:])  # drop warm-in
    p50, p99 = float(np.percentile(lat, 50)), float(np.percentile(lat, 99))

    # ---- device-side frame-latency tail (tunnel-jitter-proof) -----------
    # The wall p50/p99 above pays one tunnel round trip PER frame, so its
    # tail mixes device jitter with tunnel weather and the two were
    # indistinguishable across rounds (r03->r04: wall p99 34.6 -> 46.5 ms
    # with device_frame_ms flat — VERDICT r4 #3). These keys time batches
    # of 10 back-to-back chunk=1 dispatches with ONE sync per batch and
    # subtract the measured sync RTT: tunnel jitter is divided by 10 and
    # mostly cancelled, so a moving device tail (thermal/contention) shows
    # up here and only here.
    trivial = jax.jit(lambda: jnp.float32(0))
    float(trivial())
    t0 = time.time()
    for _ in range(5):
        float(trivial())
    rtt_s = (time.time() - t0) / 5
    dev_lat = []
    batch_m = 10
    for _ in range(32):
        t0 = time.time()
        for _ in range(batch_m):
            kept, nk, mem = run1(variables, frame1, mem)
        np.array(nk)
        el = time.time() - t0
        dev_lat.append(max(el - rtt_s, el * 0.5) / batch_m * 1000)
    dev_lat = np.array(dev_lat[2:])  # drop warm-in batches
    device_p50 = float(np.percentile(dev_lat, 50))
    device_p99 = float(np.percentile(dev_lat, 99))

    # ---- MFU: cost-analysis FLOPs of the single-frame graph -------------
    mfu = None
    device_mfu = None
    flops_per_frame = None
    try:
        comp = run1.lower(variables, frame1, mem).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops_per_frame = float(ca.get("flops", 0.0))
        # int8 A/B: the quantized chains run on the s8 MXU path at 2x the
        # bf16 rate, so the utilization denominator doubles
        peak = V5E_BF16_PEAK * (2 if cfg.quantize == "int8" else 1)
        if flops_per_frame > 0:
            mfu = flops_per_frame * fps / peak
            # hardware-utilization view: the headline fps folds the dev
            # tunnel's per-video sync (~28 ms) into the denominator, which
            # says nothing about the chip; this key uses the amortized
            # device step instead
            device_mfu = flops_per_frame * (1e3 / device_frame_ms) / peak
    except Exception:
        pass

    # ---- training throughput (16-frame clip, full pipeline) -------------
    train_fps = None
    train_mfu = None
    try:
        from phnet_tpu.losses import LaneCriterion
        from phnet_tpu.train import (
            build_optimizer, create_train_state, make_train_step,
        )

        # training is always f32/bf16 — quantize is inference-only, so the
        # int8 A/B run still measures the same comparable train step.
        # scan_unroll=1 for training: the round-4 sweep measured unroll
        # 1/2/5 at B=4 as 299.8/317.0/333.4 ms/step (unroll buys nothing
        # in the backward scan and its stacked-buffer layout copies cost),
        # and unroll>1 also INFLATES cost-analysis FLOPs ~1.33x (the cost
        # model counts ceil(T/u)*u frames), which overstated train_mfu_pct
        # in rounds <=3 — unroll=1 keeps both the time and the MFU honest.
        t_model = PHNet(dataclasses.replace(
            cfg, quantize="none", scan_unroll=1))
        t_frames = jnp.asarray(rng.normal(
            size=(1, 16, cfg.img_h, cfg.img_w, 3)).astype(np.float32))
        lab = np.full((1, 16, cfg.max_lanes, cfg.lane.dim), -1e5, np.float32)
        lab[..., 0] = 1.0
        lab[..., 1] = 0.0
        for i in range(3):
            lab[:, :, i, :2] = (0.0, 1.0)
            lab[:, :, i, 2:5] = (0.0, 0.2 + 0.3 * i, 0.5)
            lab[:, :, i, cfg.lane.col_length] = 0.8
            lab[:, :, i, cfg.lane.col_invalid_length] = 0.0
            lab[:, :, i, cfg.lane.col_xs:] = rng.uniform(
                50, 700, (1, 16, cfg.lane.n_offsets))
        t_labels = jnp.asarray(lab)
        tcfg = TrainConfig()
        criterion = LaneCriterion(cfg, tcfg.loss)
        tx = build_optimizer(tcfg, 1000)
        state = create_train_state(
            t_model, cfg, jax.random.key(0), t_frames, t_labels, tx)
        step = jax.jit(make_train_step(t_model, criterion, tx),
                       donate_argnums=0)
        state, m = step(state, t_frames, t_labels, jax.random.key(1))
        float(m["loss"])
        t0 = time.time()
        n_steps = 8
        for i in range(n_steps):
            state, m = step(state, t_frames, t_labels, jax.random.key(i))
        float(m["loss"])
        train_fps = 16 * n_steps / (time.time() - t0)
        # train MFU: cost-analysis FLOPs of the whole jitted train step
        # (fwd + criterion + bwd + AdamW) x measured steps/sec / bf16 peak
        try:
            tcomp = step.lower(state, t_frames, t_labels,
                               jax.random.key(0)).compile()
            tca = tcomp.cost_analysis()
            tca = tca[0] if isinstance(tca, (list, tuple)) else tca
            train_flops = float(tca.get("flops", 0.0))
            if train_flops > 0:
                train_mfu = train_flops * (train_fps / 16) / V5E_BF16_PEAK
        except Exception:
            pass
    except Exception:
        pass

    # ---- training throughput at clip-batch 4 ---------------------------
    # B=1 training is bound by the per-frame small-tensor account (ROADMAP
    # round 4: the backward scan is a ~45 ms tail of sub-5us ops); batching
    # clips amortizes the B-independent weight/accumulator traffic and is
    # the per-chip production configuration (the reference's own recipe is
    # a global batch of 4, trainVIL.py:96-103). Guarded by elapsed time so
    # a cold compile cache cannot push the whole bench past the driver's
    # attempt timeout.
    train_fps_b4 = None
    train_mfu_b4 = None
    if (train_fps is not None
            and time.time() - t_bench_start < 0.55 * _ATTEMPT_TIMEOUT_S):
        try:
            b4 = 4
            t_frames4 = jnp.concatenate([t_frames] * b4, axis=0)
            t_labels4 = jnp.concatenate([t_labels] * b4, axis=0)
            state4 = create_train_state(
                t_model, cfg, jax.random.key(0), t_frames4, t_labels4, tx)
            step4 = jax.jit(make_train_step(t_model, criterion, tx),
                            donate_argnums=0)
            state4, m4 = step4(state4, t_frames4, t_labels4, jax.random.key(1))
            float(m4["loss"])
            t0 = time.time()
            n4 = 4
            for i in range(n4):
                state4, m4 = step4(state4, t_frames4, t_labels4,
                                   jax.random.key(i))
            float(m4["loss"])
            train_fps_b4 = b4 * 16 * n4 / (time.time() - t0)
            try:
                tcomp4 = step4.lower(state4, t_frames4, t_labels4,
                                     jax.random.key(0)).compile()
                tca4 = tcomp4.cost_analysis()
                tca4 = tca4[0] if isinstance(tca4, (list, tuple)) else tca4
                fl4 = float(tca4.get("flops", 0.0))
                if fl4 > 0:
                    train_mfu_b4 = fl4 * (train_fps_b4 / (b4 * 16)) / V5E_BF16_PEAK
            except Exception:
                pass
            del state4, step4, t_frames4, t_labels4
        except Exception:
            pass

    # ---- OpenLane preset throughput (testOLV3 protocol: 16-frame chunks,
    # 72 offsets, window-5 memory, soft routing) -------------------------
    ol_fps = None
    try:
        from phnet_tpu.config import openlane_config

        ol_cfg = dataclasses.replace(
            openlane_config().model, compute_dtype="bfloat16", scan_unroll=4)
        ol_model = PHNet(ol_cfg)
        ol_chunk = 16
        ol_frames = jnp.asarray(rng.normal(
            size=(1, ol_chunk, ol_cfg.img_h, ol_cfg.img_w, 3)
        ).astype(np.float32))
        ol_vars = jax.jit(
            lambda r, f: ol_model.init(r, f, None, train=False))(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            ol_frames)

        def ol_chunk_fn(variables, frames, mem):
            outs, mem = ol_model.apply(variables, frames, None, train=False,
                                       initial_memory=mem)
            return outs.kept, outs.num_kept, mem

        ol_chunk_fn = jax.jit(ol_chunk_fn)
        ol_mem0 = init_memory(ol_cfg, 1, ol_cfg.memory.window)
        kept, nk, mem = ol_chunk_fn(ol_vars, ol_frames, ol_mem0)
        np.array(nk)
        t0 = time.time()
        n_chunks = 12
        for _ in range(n_chunks):
            mem = init_memory(ol_cfg, 1, ol_cfg.memory.window)
            kept, nk, mem = ol_chunk_fn(ol_vars, ol_frames, mem)
        np.array(nk)
        ol_fps = ol_chunk * n_chunks / (time.time() - t0)
    except Exception:
        pass

    # ---- multi-stream serving aggregate (device-resident ticks, B=8) ----
    # Production serving amortizes the weight-bound detect scan's HBM
    # reads across streams (tools/serving_sweep.py measured the knee at
    # B=8). Same tick protocol as the sweep: one jitted step = one frame
    # for each of B streams with carried memory, inputs resident, N
    # back-to-back dispatches, one checksum fence, measured sync RTT
    # subtracted so the number reflects device time rather than the dev
    # tunnel's scalar-fetch latency.
    serving_agg_fps_b8 = None
    try:
        b_streams = 8
        # StreamingServer's production ingestion (one shared resolver —
        # s2d-packed compute-dtype frames on TPU, zero device layout
        # copies; measured B=8: 1168.0 agg fps vs 1097.4 width / 1061.7
        # in-graph s2d / 999.4 conv7, 2026-08-21)
        from phnet_tpu.serving import (
            packed_frame_shape, resolve_serving_ingest,
        )

        s_cfg, s_mode = resolve_serving_ingest(cfg)
        s_model = PHNet(s_cfg)
        sf = rng.normal(size=(b_streams, 1) + packed_frame_shape(
            s_mode, cfg.img_h, cfg.img_w))
        sframes = jnp.asarray(sf.astype(np.float32))
        if s_mode:
            sframes = sframes.astype(jnp.bfloat16)
        s_vars = jax.jit(
            lambda r, f: s_model.init(r, f, None, train=False))(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            sframes)

        def s_chunk(variables, frames, mem):
            outs, mem = s_model.apply(variables, frames, None, train=False,
                                      initial_memory=mem)
            return outs.kept, outs.num_kept, mem

        smem = init_memory(cfg, b_streams, video_frames)
        # hold the frame batch in the compiler's preferred entry layout
        # (kills the per-tick %copy.1000 relayout: B=8 1193 -> 1248 agg
        # fps, tick 6.71 -> 6.41 ms, traced sweep 2026-08-21; pinning
        # variables+memory too measured NEGATIVE at 1203 — frames only)
        from phnet_tpu.serving import compile_with_pinned_input

        stick, (_, sframes, smem) = compile_with_pinned_input(
            s_chunk, (s_vars, sframes, smem), 1, donate_argnums=(2,))
        kept, nk, smem = stick(s_vars, sframes, smem)
        np.array(nk)  # compile + warm
        kept, nk, smem = stick(s_vars, sframes, smem)
        np.array(nk)
        # re-measure the sync RTT close in time (tunnels drift)
        t0 = time.time()
        for _ in range(5):
            float(trivial())
        rtt_s = (time.time() - t0) / 5
        n_ticks = 100
        t0 = time.time()
        for _ in range(n_ticks):
            kept, nk, smem = stick(s_vars, sframes, smem)
        np.array(nk)
        # the RTT correction removes the one final-sync round trip; guard
        # against over-subtraction (the trivial jit's sync cost is not
        # exactly the fence on np.array(nk)) so a fast-tunnel run can
        # never produce a tiny/negative denominator
        elapsed = time.time() - t0
        serving_agg_fps_b8 = (b_streams * n_ticks /
                              max(elapsed - rtt_s, elapsed * 0.5))
    except Exception:
        pass

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE_TORCH_CPU.json")
    vs = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        vs = fps / base["torch_cpu_fps"]

    print(json.dumps({
        "metric": "VIL-100 streaming inference throughput (100-frame videos, "
                  "temporal memory, NMS on device)",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        # chunk=1 call with a host sync per frame — includes the
        # host<->device round trip (large under the axon tunnel; the
        # amortized device step below is the per-frame compute time)
        "p50_frame_latency_ms": round(p50, 2),
        "p99_frame_latency_ms": round(p99, 2),
        # device-side tail: batched dispatches, one RTT-corrected sync per
        # batch of 10 — separates device jitter from tunnel weather
        "device_p50_frame_ms": round(device_p50, 3),
        "device_p99_frame_ms": round(device_p99, 3),
        "frame_ms_amortized": round(frame_ms_amortized, 2),
        # back-to-back dispatches, one final sync — approaches the pure
        # per-frame device time and is robust to tunnel-fixture changes
        "device_frame_ms": round(device_frame_ms, 3),
        "flops_per_frame_g": (round(flops_per_frame / 1e9, 2)
                              if flops_per_frame else None),
        "mfu_pct": round(mfu * 100, 2) if mfu is not None else None,
        "device_mfu_pct": (round(device_mfu * 100, 2)
                           if device_mfu is not None else None),
        "train_fps_16frame_clip": (round(train_fps, 2)
                                   if train_fps is not None else None),
        "train_mfu_pct": (round(train_mfu * 100, 2)
                          if train_mfu is not None else None),
        # clip-batch-4 training (the reference's global batch, on one chip)
        "train_fps_16frame_clip_b4": (round(train_fps_b4, 2)
                                      if train_fps_b4 is not None else None),
        "train_mfu_pct_b4": (round(train_mfu_b4 * 100, 2)
                             if train_mfu_b4 is not None else None),
        "openlane_fps": round(ol_fps, 2) if ol_fps is not None else None,
        # device-resident multi-stream serving (the production protocol:
        # batching amortizes the weight-bound detect scan B ways)
        "serving_agg_fps_b8": (round(serving_agg_fps_b8, 2)
                               if serving_agg_fps_b8 is not None else None),
    }))


if __name__ == "__main__":
    if os.environ.get(_CHILD_ENV):
        main()
    else:
        sys.exit(_supervise())
