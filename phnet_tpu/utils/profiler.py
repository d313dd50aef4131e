"""Profiling / MFU accounting for the PHNet TPU stack.

The reference has no profiling subsystem (SURVEY §5.1: wall-clock ``fps``
prints in ``testVIL.py:99-130`` and a param count, nothing else). This
module provides the TPU-native equivalent:

* :func:`cost_summary` — XLA cost analysis of any jitted computation:
  FLOPs, HBM bytes accessed, arithmetic intensity, and a roofline estimate
  (compute-bound vs bandwidth-bound, time lower bound on the chip).
* :func:`stage_breakdown` — wall-clock split of the inference pipeline
  into its stages: batched encode (backbone+FPN), per-frame detect scan
  (head + router + temporal memory + NMS), and an isolated NMS microbench,
  each with its own cost analysis.
* :func:`latency_profile` — p50/p90/p99 of an arbitrary step closure.
* :func:`trace` — context manager around ``jax.profiler`` writing an
  xplane trace for offline TensorBoard inspection.

CLI::

    python -m phnet_tpu.utils.profiler [--ol] [--chunk N] [--trace DIR]
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

# Peak numbers for the roofline (TPU v5e single chip).
V5E_BF16_PEAK_FLOPS = 197e12
V5E_HBM_BW = 819e9  # bytes/sec


def _cost_analysis(compiled) -> Dict[str, float]:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return dict(ca) if ca else {}


def cost_summary(fn: Callable, *args, fps: Optional[float] = None,
                 peak_flops: float = V5E_BF16_PEAK_FLOPS,
                 hbm_bw: float = V5E_HBM_BW) -> Dict[str, float]:
    """Compile ``fn(*args)`` and report the XLA cost model's view of it.

    Returns flops, bytes accessed, arithmetic intensity (flops/byte),
    roofline-bound kind, and the roofline time lower bound in ms. If
    ``fps`` (graph calls/sec actually achieved) is given, adds ``mfu`` and
    ``membw_util`` — the fraction of peak compute / HBM bandwidth the
    measured rate corresponds to. Note: XLA's "bytes accessed" counts every
    HLO's operands *before* fusion, so it is an upper bound on real HBM
    traffic and ``membw_util`` can exceed 1 for well-fused graphs.
    """
    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    comp = jitted.lower(*args).compile()
    ca = _cost_analysis(comp)
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    out: Dict[str, float] = {"flops": flops, "bytes_accessed": byts}
    if byts > 0:
        out["arith_intensity"] = flops / byts
    t_compute = flops / peak_flops if flops else 0.0
    t_memory = byts / hbm_bw if byts else 0.0
    out["roofline_ms"] = max(t_compute, t_memory) * 1e3
    out["bound"] = "compute" if t_compute >= t_memory else "memory"
    if fps is not None and fps > 0:
        if flops:
            out["mfu"] = flops * fps / peak_flops
        if byts:
            out["membw_util"] = byts * fps / hbm_bw
    return out


def checksum(fn: Callable) -> Callable:
    """Wrap ``fn`` so it returns a single float32 scalar that depends on
    every output element. Fetching that scalar to the host is a sync that
    cannot complete before the computation has: on remote-tunnel backends
    (axon) ``jax.block_until_ready`` returns once dispatch is queued, so
    wall-clock timing MUST synchronize through a device->host transfer."""

    def wrapped(*args):
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        s = jnp.float32(0)
        for leaf in leaves:
            s = s + jnp.sum(leaf.astype(jnp.float32))
        return s

    return wrapped


def latency_profile(step: Callable[[], None], iters: int = 100,
                    warmup: int = 10) -> Dict[str, float]:
    """p50/p90/p99/mean of ``step()`` wall time in ms. ``step`` must block
    until the device work is done by fetching a result to the host (e.g.
    end with ``np.array(...)`` / ``float(...)`` on an output; see
    :func:`checksum` — ``block_until_ready`` is NOT a reliable fence on
    remote-tunnel backends)."""
    for _ in range(warmup):
        step()
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        step()
        lat.append((time.perf_counter() - t0) * 1e3)
    arr = np.asarray(lat)
    return {
        "p50_ms": float(np.percentile(arr, 50)),
        "p90_ms": float(np.percentile(arr, 90)),
        "p99_ms": float(np.percentile(arr, 99)),
        "mean_ms": float(arr.mean()),
    }


@contextlib.contextmanager
def trace(logdir: str):
    """Write a ``jax.profiler`` xplane trace under ``logdir`` for offline
    TensorBoard inspection (the in-image tensorboard-plugin-profile is ABI
    incompatible; the trace itself is portable)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def stage_breakdown(cfg=None, chunk: int = 25, iters: int = 20,
                    seed: int = 0) -> Dict[str, Dict[str, float]]:
    """Time the inference pipeline stage by stage on the current backend.

    Stages (mirroring the ``encode``/``detect`` split of
    :class:`phnet_tpu.models.PHNet` and the NMS op inside the detect scan):

    * ``encode``  — backbone+FPN over the whole chunk (batched over T, the
      MXU-heavy part);
    * ``detect``  — the per-frame ``lax.scan`` (anchor pooling, dynamic
      conv, both branches, router, temporal memory, NMS);
    * ``e2e``     — full chunk graph (jit fusion across the split means
      e2e can beat encode+detect measured separately);
    * ``nms``     — isolated per-frame lane NMS microbench.

    Each entry carries measured ms per chunk (and per frame), plus XLA
    cost-analysis FLOPs/bytes and the roofline bound.
    """
    from ..config import vil100_config
    from ..models import PHNet
    from ..models.phnet import init_memory
    from ..ops import lane_nms, nms_proposals_from_predictions

    if cfg is None:
        import dataclasses

        cfg = dataclasses.replace(
            vil100_config().model, compute_dtype="bfloat16", scan_unroll=5)
    model = PHNet(cfg)
    rng = np.random.default_rng(seed)
    frames = jnp.asarray(rng.normal(
        size=(1, chunk, cfg.img_h, cfg.img_w, 3)).astype(np.float32))
    variables = jax.jit(lambda r, f: model.init(r, f, None, train=False))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, frames)
    window = cfg.memory.window if cfg.memory.window > 0 else 100
    mem0 = init_memory(cfg, 1, window)

    encode = jax.jit(lambda v, f: model.apply(v, f, train=False,
                                              method=PHNet.encode))
    feats = jax.block_until_ready(encode(variables, frames))

    def detect_fn(v, feats, mem):
        outs, mem = model.apply(v, feats, None, False, mem,
                                method=PHNet.detect)
        return outs.kept, outs.num_kept, mem

    detect = jax.jit(detect_fn)

    def e2e_fn(v, f, mem):
        outs, mem = model.apply(v, f, None, train=False, initial_memory=mem)
        return outs.kept, outs.num_kept, mem

    e2e = jax.jit(e2e_fn)

    # Timing protocol for remote backends (axon): back-to-back dispatches
    # queue in order on the device; one host fetch of a checksum scalar at
    # the end is the fence (block_until_ready returns at dispatch, see
    # checksum()). The measured one-way sync cost (RTT of a trivial scalar
    # fetch) is subtracted so per-stage numbers reflect device time.
    encode_ck = jax.jit(checksum(lambda v, f: encode(v, f)))
    detect_ck = jax.jit(checksum(lambda v, fe, m: detect(v, fe, m)))
    e2e_ck = jax.jit(checksum(lambda v, f, m: e2e(v, f, m)))

    trivial = jax.jit(lambda: jnp.float32(0))
    float(trivial())
    t0 = time.perf_counter()
    for _ in range(5):
        float(trivial())
    rtt_ms = (time.perf_counter() - t0) / 5 * 1e3

    def timeit(dispatch, sync) -> float:
        """ms per call: `iters-1` queued dispatches + one synced call,
        minus the measured sync RTT."""
        sync()  # compile + warm both graphs
        dispatch()
        sync()
        t0 = time.perf_counter()
        for _ in range(iters - 1):
            dispatch()
        sync()
        total = (time.perf_counter() - t0) * 1e3
        return max(total - rtt_ms, 1e-6) / iters

    report: Dict[str, Dict[str, float]] = {"sync": {"ms_per_frame": rtt_ms}}

    enc_ms = timeit(lambda: encode(variables, frames),
                    lambda: float(encode_ck(variables, frames)))
    report["encode"] = {"ms_per_chunk": enc_ms, "ms_per_frame": enc_ms / chunk}
    report["encode"].update(cost_summary(
        encode, variables, frames, fps=1e3 / enc_ms))

    det_ms = timeit(lambda: detect(variables, feats, mem0),
                    lambda: float(detect_ck(variables, feats, mem0)))
    report["detect"] = {"ms_per_chunk": det_ms, "ms_per_frame": det_ms / chunk}
    report["detect"].update(cost_summary(
        detect, variables, feats, mem0, fps=1e3 / det_ms))

    e2e_ms = timeit(lambda: e2e(variables, frames, mem0),
                    lambda: float(e2e_ck(variables, frames, mem0)))
    report["e2e"] = {"ms_per_chunk": e2e_ms, "ms_per_frame": e2e_ms / chunk}
    report["e2e"].update(cost_summary(
        e2e, variables, frames, mem0, fps=1e3 / e2e_ms))

    # isolated NMS microbench at the model's own geometry
    spec = cfg.lane
    preds = jnp.asarray(rng.normal(
        size=(cfg.head.num_priors, spec.dim)).astype(np.float32))

    def nms_fn(p):
        proposals = nms_proposals_from_predictions(p, spec, cfg.img_w)
        scores = jax.nn.softmax(p[:, :2], axis=-1)[:, 1]
        return lane_nms(proposals, scores, scores > 0.2,
                        cfg.test.nms_thres, spec.n_offsets, cfg.test.nms_topk)

    nms = jax.jit(nms_fn)
    nms_ck = jax.jit(checksum(nms_fn))
    nms_ms = timeit(lambda: nms(preds), lambda: float(nms_ck(preds)))
    report["nms"] = {"ms_per_frame": nms_ms}
    report["nms"].update(cost_summary(nms, preds, fps=1e3 / nms_ms))
    return report


def format_breakdown(report: Dict[str, Dict[str, float]]) -> str:
    lines = [
        f"{'stage':<8}{'ms/frame':>10}{'GFLOP':>9}{'GB':>8}"
        f"{'AI':>7}{'bound':>9}{'MFU%':>7}{'BW%':>7}"
    ]
    for name, r in report.items():
        lines.append(
            f"{name:<8}"
            f"{r.get('ms_per_frame', float('nan')):>10.3f}"
            f"{r.get('flops', 0) / 1e9:>9.2f}"
            f"{r.get('bytes_accessed', 0) / 1e9:>8.3f}"
            f"{r.get('arith_intensity', 0):>7.1f}"
            f"{r.get('bound', '-'):>9}"
            f"{100 * r.get('mfu', 0):>7.2f}"
            f"{100 * r.get('membw_util', 0):>7.2f}"
        )
    return "\n".join(lines)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ol", action="store_true",
                    help="profile the OpenLane preset instead of VIL-100")
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--trace", default=None,
                    help="also write a jax.profiler xplane trace here")
    args = ap.parse_args(argv)

    import dataclasses

    from ..config import openlane_config, vil100_config

    base = openlane_config() if args.ol else vil100_config()
    cfg = dataclasses.replace(
        base.model, compute_dtype="bfloat16", scan_unroll=5)

    ctx = trace(args.trace) if args.trace else contextlib.nullcontext()
    with ctx:
        report = stage_breakdown(cfg, chunk=args.chunk, iters=args.iters)
    print(format_breakdown(report))
    if args.trace:
        from .xplane import op_report

        print()
        print(op_report(args.trace, top=30))


if __name__ == "__main__":
    main()
