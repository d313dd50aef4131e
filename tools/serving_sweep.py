"""Multi-stream serving sweep: aggregate throughput vs stream count.

The single-stream detect scan is MEMORY-bound on re-reading the collapsed
DynamicConv generator weights every frame (xplane: the [1024,8192] /
[4608,1024] / [64,8192] bf16 weight reads dominate the scan's ~0.28
GB/frame; arithmetic intensity sits right at the v5e ridge point at
A=240 anchor rows). Batching B streams through one tick amortizes those
weight reads B ways — the TPU-native answer to weight-bound serving is
more streams per chip, then more chips per mesh
(``StreamingServer(mesh=...)``).

Protocol (matches the ROADMAP "device-resident aggregate" rows): one
jitted tick = one frame for each of B streams with carried memory;
inputs stay on device; N back-to-back dispatches with one checksum fence
at the end (``block_until_ready`` is not a fence on the axon tunnel).

Prints one JSON line per batch size; run on the real chip:

    python tools/serving_sweep.py --batches 1 4 8 16 32 --ticks 100
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[1, 4, 8, 16, 32])
    ap.add_argument("--ticks", type=int, default=100)
    ap.add_argument("--window", type=int, default=100)
    ap.add_argument("--ol", action="store_true",
                    help="OpenLane preset instead of VIL-100")
    ap.add_argument("--quantize", choices=("none", "int8", "w8"),
                    default="none",
                    help="A/B the quantized DynamicConv chains (w8 halves "
                         "the weight bytes the weight-bound scan re-reads)")
    ap.add_argument("--router-pallas", action="store_true",
                    help="A/B the fused Pallas router chain (fixed VMEM "
                         "footprint) against XLA's fusion, whose f32 "
                         "[B*A, C, P] intermediates spill past B=8")
    ap.add_argument("--stem", choices=("conv7", "space_to_depth", "width_packed"),
                    default=None,
                    help="A/B the backbone stem: the 7x7/s2 conv on 3 "
                         "input channels runs ~4% MFU at B=8 (18% of the "
                         "tick, xplane 2026-08-21); space_to_depth "
                         "refeeds it 48 channels")
    ap.add_argument("--router-bf16", action="store_true",
                    help="A/B bf16 router-chain intermediates (halves the "
                         "spilling buffers; inference-only)")
    ap.add_argument("--router-chain", choices=("plane", "flat"),
                    default="plane",
                    help="A/B the router chain layout (flat = [T, C*P], "
                         "full lane utilization)")
    ap.add_argument("--dual-heads", choices=("on", "off"), default=None,
                    help="A/B cross-branch head-GEMM batching; default "
                         "follows HeadConfig.dual_branch_heads (on)")
    ap.add_argument("--packed", choices=("width", "s2d"), default=None,
                    help="pre-packed frame ingestion: 'width' = "
                         "[B,1,H,W/2,6] (free host reshape), 's2d' = "
                         "[B,1,H/2,W/2,12] (loader-emitted space-to-"
                         "depth); frames arrive in compute dtype")
    ap.add_argument("--pin-layout", choices=("on", "off", "all"),
                    default="on",
                    help="hold the frame batch in the compiler's "
                         "preferred entry layout (kills the per-tick "
                         "relayout copy; 'all' also pins variables + "
                         "memory; 'off' for A/B)")
    ap.add_argument("--trace", default=None,
                    help="write a jax.profiler xplane trace of the timed "
                         "ticks under DIR/b<N> and print the per-op device "
                         "report after each batch size")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from phnet_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from phnet_tpu.config import openlane_config, vil100_config
    from phnet_tpu.models import PHNet
    from phnet_tpu.models.phnet import init_memory

    base = openlane_config() if args.ol else vil100_config()
    head = dataclasses.replace(base.model.head,
                               router_pallas=args.router_pallas,
                               router_chain_bf16=args.router_bf16,
                               router_chain_impl=args.router_chain)
    if args.dual_heads is not None:
        head = dataclasses.replace(
            head, dual_branch_heads=args.dual_heads == "on")
    cfg = dataclasses.replace(base.model, compute_dtype="bfloat16",
                              quantize=args.quantize, head=head)
    if args.stem:
        cfg = dataclasses.replace(
            cfg, backbone=dataclasses.replace(cfg.backbone, stem=args.stem))
    if args.packed:
        stem = ("width_packed" if args.packed == "width"
                else "space_to_depth")
        cfg = dataclasses.replace(
            cfg, packed_frames=args.packed,
            backbone=dataclasses.replace(cfg.backbone, stem=stem))
    model = PHNet(cfg)

    rng = np.random.default_rng(0)
    if args.packed == "width":
        fshape1 = (1, 1, cfg.img_h, cfg.img_w // 2, 6)
    elif args.packed == "s2d":
        fshape1 = (1, 1, cfg.img_h // 2, cfg.img_w // 2, 12)
    else:
        fshape1 = (1, 1, cfg.img_h, cfg.img_w, 3)
    frames1 = jnp.asarray(rng.normal(size=fshape1).astype(np.float32))
    variables = jax.jit(lambda r, f: model.init(r, f, None, train=False))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, frames1)

    def tick(variables, frames, mem):
        outs, mem = model.apply(variables, frames, None, train=False,
                                initial_memory=mem)
        return outs.kept, outs.num_kept, mem

    # measured sync RTT so the fps number reflects device time, not the
    # development tunnel's scalar-fetch latency
    trivial = jax.jit(lambda: jnp.float32(0))
    float(trivial())
    t0 = time.perf_counter()
    for _ in range(5):
        float(trivial())
    rtt_s = (time.perf_counter() - t0) / 5

    for b in args.batches:
        if args.packed:
            fdt = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                   else jnp.float32)
            frames = jnp.asarray(rng.normal(
                size=(b,) + fshape1[1:]).astype(np.float32)).astype(fdt)
        else:
            frames = jnp.asarray(rng.normal(
                size=(b, 1, cfg.img_h, cfg.img_w, 3)).astype(np.float32))
        mem = init_memory(cfg, b, args.window)
        if args.pin_layout != "off":
            from phnet_tpu.serving import compile_with_pinned_input

            pins = (0, 1, 2) if args.pin_layout == "all" else (1,)
            step, (pv, frames, mem) = compile_with_pinned_input(
                tick, (variables, frames, mem), pins,
                donate_argnums=(2,))
            variables = pv
        else:
            step = jax.jit(tick, donate_argnums=(2,))
        kept, nk, mem = step(variables, frames, mem)
        np.array(nk)  # compile + warm
        kept, nk, mem = step(variables, frames, mem)
        np.array(nk)
        if args.trace:
            logdir = os.path.join(args.trace, "b%d" % b)
            jax.profiler.start_trace(logdir)
        t0 = time.perf_counter()
        for _ in range(args.ticks):
            kept, nk, mem = step(variables, frames, mem)
        np.array(nk)
        wall = time.perf_counter() - t0 - rtt_s
        if args.trace:
            jax.profiler.stop_trace()
        agg_fps = b * args.ticks / wall
        print(json.dumps({
            "batch_streams": b,
            "agg_fps": round(agg_fps, 1),
            "per_stream_fps": round(agg_fps / b, 1),
            "tick_ms": round(wall / args.ticks * 1e3, 3),
            "sync_rtt_ms": round(rtt_s * 1e3, 2),
            "preset": "ol" if args.ol else "vil",
            "quantize": args.quantize,
            "router_pallas": args.router_pallas,
            "router_bf16": args.router_bf16,
            "router_chain": args.router_chain,
            "dual_heads": cfg.head.dual_branch_heads,
            "stem": cfg.backbone.stem,
            "packed": cfg.packed_frames,
            "pin_layout": args.pin_layout,
        }), flush=True)
        if args.trace:
            from phnet_tpu.utils.xplane import op_report

            print(op_report(logdir, top=25), flush=True)


if __name__ == "__main__":
    main()
