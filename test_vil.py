#!/usr/bin/env python
"""VIL-100 inference driver (reference ``testVIL.py`` equivalent): whole
videos through the model with temporal memory, CULane txt emission, fps
print; ``--evaluate`` runs the python CULane metric right after.

  python test_vil.py --checkpoint models/VIL100/best --data-root ./dataset
  python test_vil.py --synthetic --train-first 300   # self-contained smoke
"""

import argparse
import glob
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
    ap.add_argument("--pred-dir", default="evaluation/txt/pred_txt")
    ap.add_argument("--anno-dir", default="evaluation/txt/anno_txt")
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--synthetic-videos", type=int, default=2)
    ap.add_argument("--synthetic-frames", type=int, default=8)
    ap.add_argument("--train-first", type=int, default=0,
                    help="synthetic smoke: overfit N steps before testing")
    ap.add_argument("--evaluate", action="store_true")
    ap.add_argument("--int8", action="store_true",
                    help="shorthand for --quantize int8")
    ap.add_argument("--quantize", choices=("none", "int8", "w8"),
                    default="none",
                    help="DynamicConv-chain quantization: int8 = dynamic "
                         "w8a8 (MXU s8 path), w8 = weight-only int8 "
                         "(halves the scan's HBM weight reads); "
                         "inference-only")
    args = ap.parse_args()
    if args.int8:
        if args.quantize not in ("none", "int8"):
            ap.error("--int8 conflicts with --quantize %s" % args.quantize)
        args.quantize = "int8"

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from phnet_tpu.config import vil100_config
    from phnet_tpu.models import PHNet
    from phnet_tpu.pipeline import InferencePipeline

    cfg = vil100_config()
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
        from phnet_tpu.data.vil100 import VIL100Dataset

        dataset = VIL100Dataset(
            dataclasses.replace(cfg.data, root=args.data_root),
            cfg.model.lane, train=False)
        chunk = args.chunk

    # weights: checkpoint, or fresh init (+ optional synthetic overfit)
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
    elif args.train_first > 0:
        from phnet_tpu.losses import LaneCriterion
        from phnet_tpu.train import build_optimizer, create_train_state, make_train_step

        frames_t = jnp.asarray(clip0["frames"])[None]
        labels_t = jnp.asarray(clip0["labels"])[None]
        tx = build_optimizer(
            dataclasses.replace(cfg.train, learning_rate=2e-3),
            args.train_first * 10)
        state = create_train_state(
            model, cfg.model, jax.random.key(0), frames_t, labels_t, tx)
        step = jax.jit(make_train_step(
            model, LaneCriterion(cfg.model, cfg.train.loss), tx))
        for i in range(args.train_first):
            state, metrics = step(state, frames_t, labels_t, jax.random.key(i))
            if i % 100 == 0:
                print(f"overfit step {i}: loss {float(metrics['loss']):.4f}",
                      flush=True)
        variables = {"params": state.params, "batch_stats": state.batch_stats}

    if args.quantize != "none":
        # inference-only: the training/init paths above stay f32
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, quantize=args.quantize))
    pipe = InferencePipeline(cfg, variables, chunk=chunk)
    stats = pipe.run_and_emit(
        dataset, args.pred_dir, args.anno_dir, fmt="vil", verbose=True)
    print(f"overall: {stats['frames']} frames at {stats['fps']:.1f} fps")

    if args.evaluate:
        from phnet_tpu.evaluation import (
            aggregate_results, culane_metric, read_lines_txt)

        shape = (cfg.model.img_h, cfg.model.img_w, 3) if args.synthetic else None
        results = []
        for pf in sorted(glob.glob(os.path.join(args.pred_dir, "*", "*.lines.txt"))):
            af = pf.replace(args.pred_dir, args.anno_dir)
            pred, anno = read_lines_txt(pf), read_lines_txt(af)
            if shape is None:
                ys = [p[1] for lane in anno for p in lane] or [720]
                xs = [p[0] for lane in anno for p in lane] or [1280]
                shape = (int(max(ys)) + 1, int(max(xs)) + 1, 3)
            results.append(culane_metric(pred, anno, shape))
        print("CULane metric:", {k: round(v, 4) for k, v in
                                 aggregate_results(results).items()})


if __name__ == "__main__":
    main()
