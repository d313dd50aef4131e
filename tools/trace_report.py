"""Containment-aware xplane trace reports (beyond utils/xplane's flat view).

Three views over a ``jax.profiler`` trace directory:

* ``groups``: exclusive device time per enclosing top-level while-loop
  span ("the forward scan" / "the backward scan" / top-level) — XLA Ops
  events nest (a while's span covers its body's ops), so the flat view
  double-counts; this one attributes each op to its innermost enclosing
  while and subtracts direct children.
* ``shapes``: exclusive time aggregated by output-shape signature within
  each of the biggest groups — the view that found the f32 router-chain
  planes dominating the train backward scan (ROADMAP round 4).
* ``hist``: histogram of exclusive op durations per group — distinguishes
  "one hot op" from "a tail of 60k tiny ops".

Usage::

    python tools/trace_report.py /tmp/trace groups|shapes|hist [--top N]
"""

import argparse
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from phnet_tpu.utils.xplane import find_xplane_files, parse_xspace


def _load_events(logdir, device_substr="TPU"):
    planes = []
    for f in find_xplane_files(logdir):
        planes.extend(parse_xspace(f))
    for plane in planes:
        if device_substr not in plane.name:
            continue
        for line in plane.lines:
            if "XLA Ops" not in line.name or "Async" in line.name:
                continue
            evs = []
            for ev in line.events:
                name = plane.event_names.get(
                    ev.metadata_id, f"#{ev.metadata_id}")
                evs.append((ev.offset_ps, ev.offset_ps + ev.duration_ps, name))
            evs.sort()
            yield line.name, evs


def _attribute(evs):
    """Yield (group, exclusive_ps, name) with group = innermost enclosing
    %while span (or '(top-level)') and exclusive = duration minus direct
    children."""
    stack = []          # indices into evs
    child_cov = defaultdict(int)
    rec = []
    for i, (s, e, name) in enumerate(evs):
        while stack and s >= evs[stack[-1]][1]:
            stack.pop()
        grp = "(top-level)"
        for j in stack:
            n = evs[j][2]
            if n.startswith("%while"):
                grp = n.split(" ")[0]
                break
        if stack:
            child_cov[stack[-1]] += e - s
        rec.append((grp, i, name))
        stack.append(i)
    for grp, i, name in rec:
        s, e, _ = evs[i]
        yield grp, (e - s) - child_cov[i], name


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("logdir")
    ap.add_argument("view", choices=("groups", "shapes", "hist"),
                    nargs="?", default="groups")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--device", default="TPU")
    args = ap.parse_args()

    for line_name, evs in _load_events(args.logdir, args.device):
        rows = list(_attribute(evs))
        by_group = defaultdict(int)
        for grp, dur, _ in rows:
            by_group[grp] += dur
        ordered = sorted(by_group.items(), key=lambda x: -x[1])
        print(f"== {line_name}: exclusive totals per group")
        for grp, t in ordered[:8]:
            print(f"  {grp:<28}{t / 1e9:>10.3f} ms")

        if args.view == "groups":
            for grp, _ in ordered[:4]:
                ops = defaultdict(int)
                cnt = defaultdict(int)
                for g, dur, name in rows:
                    if g == grp:
                        ops[name.split(" ")[0]] += dur
                        cnt[name.split(" ")[0]] += 1
                print(f"-- top ops in {grp}")
                for n, t in sorted(ops.items(), key=lambda x: -x[1])[:args.top]:
                    print(f"  {n[:56]:<58}{t / 1e9:>9.3f} ms{cnt[n]:>8} evs")
        elif args.view == "shapes":
            for grp, tot in ordered[:3]:
                by_shape = defaultdict(int)
                cnt = defaultdict(int)
                for g, dur, name in rows:
                    if g != grp:
                        continue
                    m = re.search(r"= \(?([a-z0-9]+\[[0-9,]*\])", name)
                    shape = m.group(1) if m else "(?)"
                    by_shape[shape] += dur
                    cnt[shape] += 1
                print(f"-- {grp} by output shape (total {tot / 1e9:.1f} ms)")
                for shape, t in sorted(
                        by_shape.items(), key=lambda x: -x[1])[:args.top]:
                    print(f"  {shape:<28}{t / 1e9:>9.2f} ms {cnt[shape]:>8} evs")
        else:
            buckets = ["<5us", "5-20us", "20-50us", "50-200us", ">200us"]
            for grp, tot in ordered[:4]:
                b_t = defaultdict(int)
                b_n = defaultdict(int)
                n_all = 0
                for g, dur, _ in rows:
                    if g != grp:
                        continue
                    us = dur / 1e6
                    b = (buckets[0] if us < 5 else buckets[1] if us < 20
                         else buckets[2] if us < 50 else buckets[3]
                         if us < 200 else buckets[4])
                    b_t[b] += dur
                    b_n[b] += 1
                    n_all += 1
                print(f"-- {grp}: {tot / 1e9:.1f} ms, {n_all} events, "
                      f"avg {tot / 1e6 / max(n_all, 1):.1f} us")
                for b in buckets:
                    print(f"   {b:<9} {b_t[b] / 1e9:>8.2f} ms"
                          f"{b_n[b]:>8} events")


if __name__ == "__main__":
    main()
