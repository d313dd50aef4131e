"""Train-step-only microbench, for the round-4 training-performance pass.

Measures exactly the fragment bench.py measures (one full-size 16-frame
clip through the jitted train step: forward + criterion + backward +
AdamW) so numbers are comparable with the driver's
``train_fps_16frame_clip`` key, but standalone so A/B runs are quick.

Usage::

    python tools/train_bench.py [--steps 8] [--batch 1] [--clip 16]
        [--profile DIR]   # capture an xplane trace of the steady state
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_BF16_PEAK = 197e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--clip", type=int, default=16)
    ap.add_argument("--profile", type=str, default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--scan-unroll", type=int, default=5)
    ap.add_argument("--remat", type=str, default=None,
                    choices=("off", "dots", "alldots", "full"),
                    help="off = remat_frames=False (store all frame "
                         "activations); else remat_policy override")
    ap.add_argument("--assigner", type=str, default="hungarian",
                    choices=("hungarian", "dynamic_k"))
    ap.add_argument("--router-chain", type=str, default="plane",
                    choices=("plane", "flat"))
    ap.add_argument("--stem", type=str, default=None,
                    choices=("conv7", "space_to_depth", "width_packed"))
    ap.add_argument("--no-fused-opt", action="store_true")
    ap.add_argument("--norm", type=str, default=None,
                    choices=("batch", "batch_flax", "group"))
    ap.add_argument("--pool-vjp", type=str, default="scatter",
                    choices=("onehot", "scatter"))
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from phnet_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    from phnet_tpu.config import TrainConfig, vil100_config
    from phnet_tpu.models import PHNet
    from phnet_tpu.losses import LaneCriterion
    from phnet_tpu.train import build_optimizer, create_train_state, make_train_step

    cfg = dataclasses.replace(
        vil100_config().model, compute_dtype="bfloat16",
        scan_unroll=args.scan_unroll, train_assigner=args.assigner)
    cfg = dataclasses.replace(
        cfg, backbone=dataclasses.replace(
            cfg.backbone, pool_vjp=args.pool_vjp,
            **({"stem": args.stem} if args.stem else {}),
            **({"norm": args.norm} if args.norm else {})),
        head=dataclasses.replace(
            cfg.head, router_chain_impl=args.router_chain))
    if args.remat == "off":
        cfg = dataclasses.replace(cfg, remat_frames=False)
    elif args.remat is not None:
        cfg = dataclasses.replace(cfg, remat_policy=args.remat)
    model = PHNet(cfg)

    rng = np.random.default_rng(0)
    B, T = args.batch, args.clip
    t_frames = jnp.asarray(rng.normal(
        size=(B, T, cfg.img_h, cfg.img_w, 3)).astype(np.float32))
    lab = np.full((B, T, cfg.max_lanes, cfg.lane.dim), -1e5, np.float32)
    lab[..., 0] = 1.0
    lab[..., 1] = 0.0
    for i in range(3):
        lab[:, :, i, :2] = (0.0, 1.0)
        lab[:, :, i, 2:5] = (0.0, 0.2 + 0.3 * i, 0.5)
        lab[:, :, i, cfg.lane.col_length] = 0.8
        lab[:, :, i, cfg.lane.col_invalid_length] = 0.0
        lab[:, :, i, cfg.lane.col_xs:] = rng.uniform(
            50, 700, (B, T, cfg.lane.n_offsets))
    t_labels = jnp.asarray(lab)

    tcfg = TrainConfig()
    if args.no_fused_opt:
        tcfg = dataclasses.replace(tcfg, fused_optimizer=False)
    criterion = LaneCriterion(cfg, tcfg.loss)
    tx = build_optimizer(tcfg, 1000)
    state = create_train_state(
        model, cfg, jax.random.key(0), t_frames, t_labels, tx)
    step = jax.jit(make_train_step(model, criterion, tx), donate_argnums=0)

    t_compile = time.time()
    state, m = step(state, t_frames, t_labels, jax.random.key(1))
    float(m["loss"])
    print(f"compile+first step: {time.time() - t_compile:.1f}s", file=sys.stderr)

    # steady-state timing
    t0 = time.time()
    for i in range(args.steps):
        state, m = step(state, t_frames, t_labels, jax.random.key(i))
    float(m["loss"])
    dt = time.time() - t0
    fps = B * T * args.steps / dt
    ms_per_clip = dt / args.steps * 1000

    train_flops = None
    try:
        tcomp = step.lower(state, t_frames, t_labels,
                           jax.random.key(0)).compile()
        tca = tcomp.cost_analysis()
        tca = tca[0] if isinstance(tca, (list, tuple)) else tca
        train_flops = float(tca.get("flops", 0.0))
    except Exception:
        pass
    mfu = (train_flops * fps / (B * T) / V5E_BF16_PEAK * 100
           if train_flops else None)

    print({
        "train_fps": round(fps, 2),
        "ms_per_step": round(ms_per_clip, 2),
        "batch": B, "clip": T,
        "train_flops_g": round(train_flops / 1e9, 2) if train_flops else None,
        "train_mfu_pct": round(mfu, 2) if mfu else None,
    })

    if args.profile:
        with jax.profiler.trace(args.profile):
            for i in range(3):
                state, m = step(state, t_frames, t_labels, jax.random.key(i))
            float(m["loss"])
        print(f"trace written to {args.profile}", file=sys.stderr)


if __name__ == "__main__":
    main()
