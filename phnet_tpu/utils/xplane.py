"""Dependency-free XPlane trace parser for per-op TPU profiling.

``jax.profiler`` writes XSpace protobufs
(``<logdir>/plugins/profile/<run>/<host>.xplane.pb``); the usual consumer
is tensorboard-plugin-profile, whose native wheel is ABI-incompatible in
this image (ROADMAP). The XPlane schema is small and stable, so this
module decodes the protobuf *wire format* directly — no proto stubs, no
tensorflow — and aggregates device-side op times.

This is the profiling depth the reference lacks entirely (SURVEY §5.1:
wall-clock fps prints only): per-HLO-op device time, sorted, with
occurrence counts — enough to see where a scan body's microseconds go.

Schema (tensorflow/tsl ``xplane.proto``, public):

  XSpace{ planes:1 } XPlane{ id:1 name:2 lines:3 event_metadata:4(map)
  stat_metadata:5(map) } XLine{ id:1 name:2 timestamp_ns:3 events:4 }
  XEvent{ metadata_id:1 offset_ps:2 duration_ps:3 stats:4 }
  XEventMetadata{ id:1 name:2 display_name:4 } XStat{ metadata_id:1
  double:2 uint64:3 int64:4 str:5 bytes:6 ref:7 }

CLI::

    python -m phnet_tpu.utils.xplane /tmp/xtrace --top 40
"""

from __future__ import annotations

import glob
import os
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Tuple

# --- protobuf wire-format primitives ---------------------------------------


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) for a message buffer.
    Length-delimited values come back as memoryview slices."""
    pos, end = 0, len(buf)
    while pos < end:
        tag, pos = _read_varint(buf, pos)
        fnum, wtype = tag >> 3, tag & 7
        if wtype == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wtype == 1:  # fixed64
            val = int.from_bytes(buf[pos : pos + 8], "little")
            pos += 8
        elif wtype == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wtype == 5:  # fixed32
            val = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        else:  # groups (3/4) never appear in xplane
            raise ValueError(f"unsupported wire type {wtype}")
        yield fnum, wtype, val


# --- xplane model ----------------------------------------------------------


@dataclass
class XEvent:
    metadata_id: int = 0
    offset_ps: int = 0
    duration_ps: int = 0


@dataclass
class XLine:
    id: int = 0
    name: str = ""
    events: List[XEvent] = field(default_factory=list)


@dataclass
class XPlane:
    id: int = 0
    name: str = ""
    lines: List[XLine] = field(default_factory=list)
    event_names: Dict[int, str] = field(default_factory=dict)


def _parse_event(buf) -> XEvent:
    ev = XEvent()
    for fnum, _, val in _fields(buf):
        if fnum == 1:
            ev.metadata_id = val
        elif fnum == 2:
            ev.offset_ps = val
        elif fnum == 3:
            ev.duration_ps = val
    return ev


def _parse_line(buf) -> XLine:
    line = XLine()
    for fnum, _, val in _fields(buf):
        if fnum == 1:
            line.id = val
        elif fnum == 2:
            line.name = bytes(val).decode("utf-8", "replace")
        elif fnum == 4:
            line.events.append(_parse_event(val))
    return line


def _parse_event_metadata(buf) -> Tuple[int, str]:
    mid, name, display = 0, "", ""
    for fnum, _, val in _fields(buf):
        if fnum == 1:
            mid = val
        elif fnum == 2:
            name = bytes(val).decode("utf-8", "replace")
        elif fnum == 4:
            display = bytes(val).decode("utf-8", "replace")
    return mid, name or display


def _parse_plane(buf) -> XPlane:
    plane = XPlane()
    for fnum, _, val in _fields(buf):
        if fnum == 1:
            plane.id = val
        elif fnum == 2:
            plane.name = bytes(val).decode("utf-8", "replace")
        elif fnum == 3:
            plane.lines.append(_parse_line(val))
        elif fnum == 4:  # map<int64, XEventMetadata>: entry{key:1, value:2}
            key, meta = 0, (0, "")
            for efn, _, ev in _fields(val):
                if efn == 1:
                    key = ev
                elif efn == 2:
                    meta = _parse_event_metadata(ev)
            plane.event_names[key or meta[0]] = meta[1]
    return plane


def parse_xspace(path: str) -> List[XPlane]:
    """Parse one ``.xplane.pb`` file into its planes."""
    with open(path, "rb") as f:
        buf = f.read()
    planes = []
    for fnum, _, val in _fields(buf):
        if fnum == 1:
            planes.append(_parse_plane(val))
    return planes


def find_xplane_files(logdir: str) -> List[str]:
    """Locate xplane.pb files under a ``jax.profiler`` logdir."""
    pats = [
        os.path.join(logdir, "**", "*.xplane.pb"),
        os.path.join(logdir, "*.xplane.pb"),
    ]
    out: List[str] = []
    for p in pats:
        out.extend(glob.glob(p, recursive=True))
    return sorted(set(out))


# --- aggregation -----------------------------------------------------------


def device_op_totals(
    planes: List[XPlane], device_substr: str = "TPU",
    line_substr: str = "XLA Ops",
) -> List[Tuple[str, int, int]]:
    """Aggregate device-plane events: [(op_name, total_ps, count)] sorted
    by total time descending.

    Only lines matching ``line_substr`` count. The TPU device plane
    carries several overlapping timelines — 'XLA Modules' (the whole
    executable, a parent span), 'XLA Ops' (EXCLUSIVE per-HLO-op device
    time; sums to the module time), and 'Async XLA Ops' (DMA copy spans
    that overlap compute, so their durations double-count wall time).
    The default reports the exclusive op line; pass
    ``line_substr='Async'`` to study DMA queues instead. GPU device
    planes name their lines by stream ('Stream #1(...)'), not 'XLA Ops'
    — when the filter matches no line on any selected plane, all
    non-Async lines are aggregated instead so GPU traces still report."""
    sel_planes = [p for p in planes if device_substr in p.name]
    have_line = any(
        line_substr in ln.name for p in sel_planes for ln in p.lines)
    # the no-match fallback exists for GPU stream-named lines; it only
    # makes sense for the default exclusive-op filter. An explicit
    # non-default filter (e.g. 'Async' DMA queues) that matches nothing
    # must report empty, not silently aggregate compute lines.
    if not have_line and line_substr != "XLA Ops":
        return []
    totals: Dict[str, int] = defaultdict(int)
    counts: Dict[str, int] = defaultdict(int)
    for plane in sel_planes:
        for line in plane.lines:
            # substring match, but never let the default 'XLA Ops' pull in
            # 'Async XLA Ops' (whose spans overlap compute)
            if have_line and line_substr not in line.name:
                continue
            if "Async" in line.name and "Async" not in line_substr:
                continue
            if not have_line and "Modules" in line.name:
                # fallback aggregation: parent-span module lines would
                # double-count their children op/stream lines
                continue
            for ev in line.events:
                name = plane.event_names.get(ev.metadata_id, f"#{ev.metadata_id}")
                totals[name] += ev.duration_ps
                counts[name] += 1
    return sorted(
        ((n, t, counts[n]) for n, t in totals.items()),
        key=lambda x: -x[1],
    )


def op_report(logdir: str, top: int = 30, device_substr: str = "TPU",
              line_substr: str = "XLA Ops") -> str:
    files = find_xplane_files(logdir)
    if not files:
        return f"no .xplane.pb files under {logdir}"
    planes: List[XPlane] = []
    for f in files:
        planes.extend(parse_xspace(f))
    rows = device_op_totals(planes, device_substr, line_substr)
    if not rows:
        names = ", ".join(sorted({p.name for p in planes})[:10])
        return f"no '{device_substr}' device planes; planes seen: {names}"
    total_ps = sum(t for _, t, _ in rows)
    lines = [
        f"{'op':<58}{'ms':>9}{'%':>7}{'calls':>8}",
        "-" * 82,
    ]
    for name, t, c in rows[:top]:
        lines.append(
            f"{name[:57]:<58}{t / 1e9:>9.3f}{100 * t / total_ps:>7.2f}{c:>8}"
        )
    lines.append(f"{'TOTAL (device)':<58}{total_ps / 1e9:>9.3f}{100.0:>7.2f}")
    return "\n".join(lines)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("logdir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--device", default="TPU",
                    help="substring selecting device planes (e.g. TPU, GPU)")
    ap.add_argument("--line", default="XLA Ops",
                    help="timeline to aggregate: 'XLA Ops' (exclusive op "
                         "time, default) or 'Async' (overlapping DMA spans)")
    args = ap.parse_args(argv)
    print(op_report(args.logdir, args.top, args.device, args.line))


if __name__ == "__main__":
    main()
