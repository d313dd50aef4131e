#!/usr/bin/env python
"""Freeze evaluation fixtures (datalist + shape list) for a dataset split.

Reference equivalents: ``evaluation/datalistVIL.{txt,pickle}``,
``datalistOL.{txt,pickle}``, ``shape_list.pickle`` — pinned test-set
enumerations so scoring is byte-reproducible without re-listing the
dataset (SURVEY.md §2.6 fixtures row).

  python tools/freeze_fixtures.py --dataset vil100 --root /data \
      --out evaluation_fixtures [--shapes]
  python tools/freeze_fixtures.py --dataset openlane --root /data \
      --split validation --out evaluation_fixtures
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from phnet_tpu.evaluation.fixtures import (  # noqa: E402
    enumerate_openlane, enumerate_vil100, freeze, read_shapes,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=["vil100", "openlane"], required=True)
    ap.add_argument("--root", required=True, help="dataset root directory")
    ap.add_argument("--split", default=None,
                    help="split (default: test for vil100, validation for ol)")
    ap.add_argument("--out", required=True, help="output fixture directory")
    ap.add_argument("--shapes", action="store_true",
                    help="also freeze per-frame image shapes (reads images)")
    args = ap.parse_args()

    if args.dataset == "vil100":
        split = args.split or "test"
        entries = enumerate_vil100(args.root, split)
        name = "VIL"
        img_subdir = os.path.join("VIL100", "JPEGImages")
    else:
        split = args.split or "validation"
        entries = enumerate_openlane(args.root, split)
        name = "OL"
        img_subdir = os.path.join("OpenLane", "images", split)

    shapes = None
    if args.shapes:
        shapes = read_shapes(args.root, entries, img_subdir)

    paths = freeze(entries, args.out, name, shapes)
    print(f"froze {len(entries)} {args.dataset}/{split} entries:")
    for k, v in paths.items():
        print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
