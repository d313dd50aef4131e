"""Benchmark: streaming VIL-100 inference frames/sec on one TPU chip.

Mirrors the reference timing protocol (``testVIL.py:99-130``: whole
100-frame video through the model, fps = T / wall). We stream the video in
chunks with the temporal memory carried across chunks (identical
semantics, one compile of the chunk graph).

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "frames/sec/chip", "vs_baseline": r}
where vs_baseline is the ratio to the equivalent-compute PyTorch-CPU model
(``tools/torch_cpu_baseline.py`` -> BASELINE_TORCH_CPU.json). The
BASELINE.json north star is >= 10x PyTorch-CPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from phnet_tpu.config import vil100_config
    from phnet_tpu.models import PHNet
    from phnet_tpu.models.phnet import init_memory

    import dataclasses

    # bf16 matmuls + Pallas NMS (auto-selected on TPU) + partial scan unroll
    cfg = dataclasses.replace(
        vil100_config().model, compute_dtype="bfloat16", scan_unroll=1)
    model = PHNet(cfg)

    video_frames = 100  # VIL-100 clip length
    chunk = 25
    n_videos = 3

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

    # warmup / compile
    mem = init_memory(cfg, 1, video_frames)
    kept, nk, mem = run_chunk(variables, frames, mem)
    np.array(nk)  # force full sync through the axon tunnel

    times = []
    for _ in range(n_videos):
        mem = init_memory(cfg, 1, video_frames)
        t0 = time.time()
        for _c in range(video_frames // chunk):
            kept, nk, mem = run_chunk(variables, frames, mem)
        np.array(nk)  # device->host sync at end of video, as testVIL does
        times.append(time.time() - t0)

    total_frames = n_videos * video_frames
    fps = total_frames / sum(times)

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
    }))


if __name__ == "__main__":
    main()
