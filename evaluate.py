#!/usr/bin/env python
"""Offline evaluation driver (reference ``evaluation/evaluate_iou.py`` +
``evaluateVIL.py`` + ``evalTemporal*.py`` equivalents, one CLI).

Scores emitted ``.lines.txt`` prediction dirs against annotation dirs with
the CULane F1/mIoU metric at IoU 0.5 and 0.8, plus the temporal stability
Rs/Rj/Rm metric. Uses the native C++ evaluator when built
(``phnet_tpu/evaluation/native``), the python metric otherwise.

  python evaluate.py --pred-dir .../pred_txt --anno-dir .../anno_txt \
      --height 384 --width 768 [--temporal] [--native]
"""

import argparse
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def collect(pred_dir, anno_dir):
    videos = defaultdict(list)
    for af in sorted(glob.glob(os.path.join(anno_dir, "*", "*.lines.txt"))):
        vid = os.path.basename(os.path.dirname(af))
        frame = os.path.basename(af)
        pf = os.path.join(pred_dir, vid, frame)
        videos[vid].append((pf, af))
    return videos


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pred-dir", required=True)
    ap.add_argument("--anno-dir", required=True)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=768)
    ap.add_argument("--lane-width", type=int, default=30)
    ap.add_argument("--ious", type=float, nargs="+", default=[0.5, 0.8])
    ap.add_argument("--temporal", action="store_true")
    ap.add_argument("--native", action="store_true",
                    help="use the C++ evaluator if built")
    ap.add_argument("--datalist", default=None,
                    help="frozen datalist fixture (.txt or .pickle; ours or "
                         "the reference's) pinning the frame set and order")
    args = ap.parse_args()

    from phnet_tpu.evaluation import (
        aggregate_results, aggregate_temporal, culane_metric, read_lines_txt,
        temporal_metric_video,
    )

    if args.datalist:
        from collections import defaultdict as _dd

        from phnet_tpu.evaluation.fixtures import (
            load_datalist, pairs_from_datalist,
        )

        entries = load_datalist(args.datalist)
        videos = _dd(list)
        for e, pair in zip(entries, pairs_from_datalist(
                entries, args.pred_dir, args.anno_dir)):
            videos[e.split("/", 1)[0]].append(pair)
    else:
        videos = collect(args.pred_dir, args.anno_dir)
    if not videos:
        print("no annotation files found"); sys.exit(1)
    shape = (args.height, args.width, 3)

    if args.native:
        from phnet_tpu.evaluation.native_eval import (
            evaluate_pairs, native_available,
        )

        if native_available():
            all_pairs = [p for pairs in videos.values() for p in pairs]
            for iou in args.ious:
                res = evaluate_pairs(
                    all_pairs, args.width, args.height, args.lane_width, iou)
                print(f"[native] IoU@{iou}:", res)
            if not args.temporal:
                return
        else:
            print("native evaluator not built; falling back to python")

    data = {
        vid: [(read_lines_txt(pf), read_lines_txt(af)) for pf, af in pairs]
        for vid, pairs in videos.items()
    }
    for iou in args.ious:
        results = [
            culane_metric(pred, anno, shape, args.lane_width, iou)
            for pairs in data.values()
            for pred, anno in pairs
        ]
        agg = aggregate_results(results)
        print(f"IoU@{iou}:", {k: round(v, 4) for k, v in agg.items()})

    if args.temporal:
        counts = []
        for vid, pairs in data.items():
            preds = [p for p, _ in pairs]
            annos = [a for _, a in pairs]
            counts.append(temporal_metric_video(
                annos, preds, [shape] * len(pairs), args.lane_width, 0.5))
        print("temporal:", {k: round(v, 4) for k, v in
                            aggregate_temporal(counts).items()})


if __name__ == "__main__":
    main()
