#!/usr/bin/env python
"""VIL-100 training driver (reference ``trainVIL.py`` equivalent).

Data-parallel over all local TPU devices via the mesh (replacing 4-GPU
torchrun DDP); ``--synthetic`` trains on generated clips when the dataset
is not on disk.

  python train_vil.py --data-root ./dataset --workdir models/vil100
  python train_vil.py --synthetic --epochs 2 --frames 4
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
    ap.add_argument("--workdir", default="models/VIL100")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--frames", type=int, default=None, help="frames per clip")
    ap.add_argument("--batch", type=int, default=None, help="clips per step")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--synthetic-videos", type=int, default=4)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--init", default=None, help="weights-only init checkpoint")
    ap.add_argument("--no-mesh", action="store_true")
    ap.add_argument("--accum", type=int, default=1,
                    help="micro-batches per optimizer update (simulate the "
                         "reference's 4-process global batch on one chip)")
    ap.add_argument("--fp32", action="store_true",
                    help="disable bf16 compute (reference trains with amp; "
                         "bf16 is the TPU equivalent and ~1.3x faster)")
    # multi-host: every host runs this same command with its own
    # --process-id (the torchrun/DDP launch equivalent, trainVIL.py:156-161)
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 for multi-host training")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--assigner", default=None,
                    choices=("hungarian", "dynamic_k"),
                    help="training label assigner (default: hungarian, the "
                         "reference parity path; dynamic_k = SimOTA fast "
                         "path, see ModelConfig.train_assigner)")
    args = ap.parse_args()

    import dataclasses

    import jax

    from phnet_tpu.config import vil100_config
    from phnet_tpu.data import ClipLoader, SyntheticVideoDataset, TrainAugment
    from phnet_tpu.parallel import make_mesh
    from phnet_tpu.train.trainer import train

    if args.num_processes:
        from phnet_tpu.parallel import initialize
        initialize(args.coordinator, args.num_processes, args.process_id)

    cfg = vil100_config()
    if not args.fp32:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model, compute_dtype="bfloat16"))
    if args.epochs:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, epochs=args.epochs))
    if args.assigner:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model, train_assigner=args.assigner))
    if args.accum > 1:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, accum_steps=args.accum))
    frames = args.frames or cfg.train.sampled_frames

    n_dev = len(jax.devices())
    batch = args.batch or max(n_dev, 1)  # GLOBAL clips per step
    mesh = None if (args.no_mesh or n_dev == 1) else make_mesh(n_dev)
    # each process loads 1/process_count of the global batch
    local_batch = max(batch // jax.process_count(), 1)

    if args.synthetic:
        dataset = SyntheticVideoDataset(
            n_videos=args.synthetic_videos, frames_per_video=frames,
            img_h=cfg.model.img_h, img_w=cfg.model.img_w,
            spec=cfg.model.lane, max_lanes=cfg.model.max_lanes,
        )
    else:
        from phnet_tpu.data.vil100 import VIL100Dataset

        dataset = VIL100Dataset(
            dataclasses.replace(cfg.data, root=args.data_root),
            cfg.model.lane,
            train=True,
            sampled_frames=frames,
            max_skip=cfg.train.max_skip,
            skip_increment=cfg.train.skip_increment,
            samples_per_video=cfg.train.samples_per_video,
            augment=TrainAugment(cfg.model.img_h, cfg.model.img_w),
        )

    loader = ClipLoader(
        dataset, batch_size=local_batch, shuffle=True, seed=cfg.train.seed,
        num_shards=jax.process_count(), shard_index=jax.process_index(),
    )
    state, history = train(
        cfg, dataset, loader, args.workdir,
        mesh=mesh, resume=args.resume, initial=args.init,
    )
    print(f"done; epoch losses: {[round(h, 4) for h in history]}")


if __name__ == "__main__":
    main()
