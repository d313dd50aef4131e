"""Source-level account of the train step's HLO: for each of the two big
scan while-loops (forward frame scan, backward/VJP frame scan), count ops
in the loop body grouped by the ``metadata.op_name`` source path XLA
carries through compilation — the map from "64k tiny backward ops"
(tools/train_bench.py --profile + utils/xplane.py) to the model code that
emits them.

Run on the chip (compile comes from the persistent cache after one
train_bench run)::

    python tools/train_hlo_report.py [--top 25]
"""

import argparse
import dataclasses
import os
import re
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--scan-unroll", type=int, default=5)
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
        scan_unroll=args.scan_unroll)
    model = PHNet(cfg)

    rng = np.random.default_rng(0)
    B, T = args.batch, 16
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
    criterion = LaneCriterion(cfg, tcfg.loss)
    tx = build_optimizer(tcfg, 1000)
    state = create_train_state(
        model, cfg, jax.random.key(0), t_frames, t_labels, tx)
    step = jax.jit(make_train_step(model, criterion, tx), donate_argnums=0)
    compiled = step.lower(state, t_frames, t_labels, jax.random.key(0)).compile()
    txt = compiled.as_text()
    print(f"HLO text: {len(txt) / 1e6:.1f} MB", file=sys.stderr)

    # split into computations; find while bodies by name
    comps = {}
    cur = None
    for line in txt.splitlines():
        m = re.match(r"^(?:ENTRY )?%?([\w\.\-]+) \(.*\) -> ", line)
        if m:
            cur = m.group(1)
            comps[cur] = []
        elif cur is not None:
            comps[cur] = comps[cur]
            comps[cur].append(line)

    # group ops per computation by metadata op_name prefix
    def report(comp_name, lines, label):
        ops = [ln for ln in lines if "= " in ln and not ln.strip().startswith("ROOT tuple")]
        groups = Counter()
        kinds = Counter()
        for ln in ops:
            m = re.search(r'op_name="([^"]+)"', ln)
            name = m.group(1) if m else "(no-metadata)"
            # keep the leading jit(...)/transpose path segments up to depth 5
            parts = name.split("/")
            groups["/".join(parts[:6])] += 1
            km = re.search(r"= [\w\[\]\{\},:\(\) ]*?(\w[\w\-]*)\(", ln)
            kinds[km.group(1) if km else "?"] += 1
        print(f"\n=== {label} ({comp_name}): {len(ops)} ops")
        for g, c in groups.most_common(args.top):
            print(f"  {c:>6}  {g}")
        print("  -- op kinds:")
        for k, c in kinds.most_common(15):
            print(f"  {c:>6}  {k}")

    # find the biggest computations (likely the scan bodies)
    sizes = sorted(((len(v), k) for k, v in comps.items()), reverse=True)
    for n, k in sizes[:4]:
        report(k, comps[k], f"computation ({n} lines)")


if __name__ == "__main__":
    main()
