"""Export a trained checkpoint as an AOT deployment artifact.

Takes an Orbax checkpoint (from train_vil.py / train_ol.py) or a
reference ``.pth.tar`` and writes a ``phnet_tpu.export`` artifact
directory: serialized StableHLO of the streaming step + weights + memory
template. The artifact serves via ``DeployedServer`` with no
model-building Python (see ``phnet_tpu/export.py``).

    python tools/export_model.py --checkpoint models/VIL100/best --out art/
    python tools/export_model.py --torch-checkpoint best.pth.tar --out art/ \
        --preset openlane --batch 8 --platforms tpu cpu
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None, help="orbax checkpoint dir/name")
    ap.add_argument("--torch-checkpoint", default=None,
                    help="reference .pth.tar to import")
    ap.add_argument("--out", required=True)
    ap.add_argument("--preset", choices=("vil100", "openlane"),
                    default="vil100")
    ap.add_argument("--batch", type=int, default=1,
                    help="streams per tick (serving batch)")
    ap.add_argument("--window", type=int, default=None,
                    help="temporal memory window (default: preset)")
    ap.add_argument("--platforms", nargs="*", default=None,
                    help="lowering platforms, e.g. --platforms tpu cpu")
    ap.add_argument("--int8", action="store_true",
                    help="shorthand for --quantize int8")
    ap.add_argument("--quantize", choices=("none", "int8", "w8"),
                    default="none",
                    help="bake a quantized serving graph into the "
                         "artifact: int8 = dynamic w8a8 (MXU s8 path), "
                         "w8 = weight-only int8 (halves HBM weight reads)")
    args = ap.parse_args()
    if args.int8:
        if args.quantize not in ("none", "int8"):
            ap.error("--int8 conflicts with --quantize %s" % args.quantize)
        args.quantize = "int8"

    import jax
    import jax.numpy as jnp

    from phnet_tpu.config import openlane_config, vil100_config
    from phnet_tpu.export import export_serving_step
    from phnet_tpu.models import PHNet

    import dataclasses

    cfg = vil100_config() if args.preset == "vil100" else openlane_config()
    # keep the init/restore model f32 — quantize is inference-only and is
    # applied to the EXPORTED graph below (train-mode init would trip the
    # quantized model's training guard)
    model = PHNet(cfg.model)
    frames0 = jnp.zeros((1, 1, cfg.model.img_h, cfg.model.img_w, 3))
    variables = jax.jit(lambda r, f: model.init(r, f, None, train=False))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, frames0)

    if args.torch_checkpoint:
        import torch

        from phnet_tpu.utils.torch_import import load_reference_checkpoint

        ckpt = torch.load(args.torch_checkpoint, map_location="cpu",
                          weights_only=False)
        sd = ckpt.get("state_dict", ckpt)
        variables = load_reference_checkpoint(
            variables, {k: v.numpy() for k, v in sd.items()})
    elif args.checkpoint:
        from phnet_tpu.train import build_optimizer, create_train_state
        from phnet_tpu.train.checkpoint import CheckpointManager

        labels0 = jnp.full(
            (1, 1, cfg.model.max_lanes, cfg.model.lane.dim), -1e5, jnp.float32)
        tx = build_optimizer(cfg.train, 1)
        state = create_train_state(
            model, cfg.model, jax.random.key(0), frames0, labels0, tx)
        mgr = CheckpointManager(os.path.dirname(args.checkpoint) or ".")
        state = mgr.restore_weights(state, os.path.basename(args.checkpoint))
        variables = {"params": state.params, "batch_stats": state.batch_stats}
    else:
        print("warning: exporting with randomly initialized weights "
              "(no --checkpoint / --torch-checkpoint)", file=sys.stderr)

    mcfg = cfg.model
    if args.quantize != "none":
        mcfg = dataclasses.replace(mcfg, quantize=args.quantize)
    platforms = tuple(args.platforms) if args.platforms else None
    out = export_serving_step(
        mcfg, variables, args.out, batch=args.batch,
        memory_window=args.window, platforms=platforms)
    print(f"exported {args.preset} serving step (batch={args.batch}"
          f"{', ' + args.quantize if args.quantize != 'none' else ''})"
          f" -> {out}")


if __name__ == "__main__":
    main()
