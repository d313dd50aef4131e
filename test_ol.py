#!/usr/bin/env python
"""OpenLane-V inference driver (reference ``testOL.py``/``testOLV3.py``
equivalent): 16-frame clip chunks, memory reset per chunk (matching the
reference's per-call reset), half-scale + crop-offset CULane emission.

  python test_ol.py --checkpoint models/OpenLane/best --data-root ./dataset
  python test_ol.py --synthetic
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    from phnet_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="./dataset")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--torch-checkpoint", default=None,
                    help="reference RouterWithB .pth(.tar) checkpoint to "
                         "import (torch required to unpickle)")
    ap.add_argument("--pred-dir", default="evaluation/txt4OL/pred_txt")
    ap.add_argument("--anno-dir", default=None)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--n-offsets", type=int, default=72)
    ap.add_argument("--carry-memory", action="store_true",
                    help="carry temporal memory across chunks instead of the "
                         "reference's per-chunk reset")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--synthetic-videos", type=int, default=2)
    ap.add_argument("--synthetic-frames", type=int, default=8)
    ap.add_argument("--int8", action="store_true",
                    help="shorthand for --quantize int8")
    ap.add_argument("--quantize", choices=("none", "int8", "w8"),
                    default="none",
                    help="DynamicConv-chain quantization: int8 = dynamic "
                         "w8a8 (MXU s8 path), w8 = weight-only int8 "
                         "(halves the scan's HBM weight reads); "
                         "inference-only")
    ap.add_argument(
        "--variant", choices=("single", "multiscale", "propagate"),
        default="single",
        help="head variant: single (Router4OL), multiscale (Router4OLV2, "
             "reference testOLV3.py path), propagate (Router4OLV3 "
             "cross-frame prior propagation)")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from phnet_tpu.config import (
        openlane_config, openlane_multiscale_config, openlane_propagate_config,
    )
    from phnet_tpu.models import PHNet
    from phnet_tpu.pipeline import InferencePipeline

    make_cfg = {
        "single": openlane_config,
        "multiscale": openlane_multiscale_config,
        "propagate": openlane_propagate_config,
    }[args.variant]
    cfg = make_cfg(n_offsets=args.n_offsets)
    model = PHNet(cfg.model)

    if args.synthetic:
        from phnet_tpu.data import SyntheticVideoDataset

        dataset = SyntheticVideoDataset(
            n_videos=args.synthetic_videos,
            frames_per_video=args.synthetic_frames,
            img_h=cfg.model.img_h, img_w=cfg.model.img_w,
            spec=cfg.model.lane, max_lanes=cfg.model.max_lanes,
        )
        chunk = min(args.chunk, args.synthetic_frames)
    else:
        from phnet_tpu.data.openlane import OpenLaneDataset

        dataset = OpenLaneDataset(
            dataclasses.replace(cfg.data, root=args.data_root),
            cfg.model.lane, train=False)
        chunk = args.chunk

    clip0 = dataset[0]
    frames0 = jnp.asarray(clip0["frames"])[None, :2]
    variables = jax.jit(lambda r, f: model.init(r, f, None, train=False))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, frames0)
    if args.torch_checkpoint:
        import torch

        from phnet_tpu.utils.torch_import import load_reference_checkpoint

        ckpt = torch.load(args.torch_checkpoint, map_location="cpu",
                          weights_only=False)
        sd = ckpt.get("state_dict", ckpt)
        sd = {k: v.numpy() for k, v in sd.items()}
        variables = load_reference_checkpoint(variables, sd)
        print(f"imported reference checkpoint {args.torch_checkpoint}")
    elif args.checkpoint:
        from phnet_tpu.train import build_optimizer, create_train_state
        from phnet_tpu.train.checkpoint import CheckpointManager

        labels0 = jnp.asarray(clip0["labels"])[None, :2]
        tx = build_optimizer(cfg.train, 1)
        state = create_train_state(
            model, cfg.model, jax.random.key(0), frames0, labels0, tx)
        mgr = CheckpointManager(os.path.dirname(args.checkpoint) or ".")
        state = mgr.restore_weights(state, os.path.basename(args.checkpoint))
        variables = {"params": state.params, "batch_stats": state.batch_stats}

    if args.int8:
        if args.quantize not in ("none", "int8"):
            ap.error("--int8 conflicts with --quantize %s" % args.quantize)
        args.quantize = "int8"
    if args.quantize != "none":
        # inference-only: the training/init paths above stay f32
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, quantize=args.quantize))
    pipe = InferencePipeline(
        cfg, variables, chunk=chunk,
        memory_window=cfg.model.memory.window,
        reset_memory_per_chunk=not args.carry_memory,
    )
    stats = pipe.run_and_emit(
        dataset, args.pred_dir, args.anno_dir, fmt="ol", verbose=True)
    print(f"overall: {stats['frames']} frames at {stats['fps']:.1f} fps")


if __name__ == "__main__":
    main()
