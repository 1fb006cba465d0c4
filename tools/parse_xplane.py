"""Minimal protobuf wire-format parser for JAX profiler xplane traces.

``jax.profiler.start_trace`` works through the axon tunnel and dumps
``*.xplane.pb`` files (round-2 finding: parsing these located the decisive
f64 double-gather; the tool was lost with that session — rebuilt here).  No
tensorflow/tensorboard dependency: the wire format is decoded by hand.

Library use:
    from tools.parse_xplane import load_space, device_op_table
    planes = load_space(path)
    table = device_op_table(planes)   # {op_name: (count, total_ps)}

CLI:  python tools/parse_xplane.py <trace_dir|xplane.pb> [-n TOP] [--filter S]
prints the top ops by total device time, plus per-line totals.
"""

from __future__ import annotations

import os
import struct
import sys
from collections import defaultdict


def _decode_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[i]
        val |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return val, i
        shift += 7


def decode_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over one message's bytes.

    value: int for varint(0)/fixed(1,5); memoryview for length-delimited(2).
    """
    i, n = 0, len(buf)
    mv = memoryview(buf)
    while i < n:
        tag, i = _decode_varint(buf, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _decode_varint(buf, i)
        elif wt == 1:
            v = struct.unpack_from("<q", buf, i)[0]
            i += 8
        elif wt == 2:
            ln, i = _decode_varint(buf, i)
            v = mv[i : i + ln]
            i += ln
        elif wt == 5:
            v = struct.unpack_from("<i", buf, i)[0]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt} at {i}")
        yield fnum, wt, v


def _zigzag(v: int) -> int:  # sint64 (XStat int64_value uses plain int64 — unused)
    return (v >> 1) ^ -(v & 1)


class Plane:
    __slots__ = ("name", "lines", "event_names")

    def __init__(self):
        self.name = ""
        self.lines = []  # (line_name, [(metadata_id, duration_ps, offset_ps)])
        self.event_names = {}  # metadata_id -> name


def parse_plane(buf) -> Plane:
    p = Plane()
    lines_raw = []
    for fnum, wt, v in decode_fields(bytes(buf)):
        if fnum == 2 and wt == 2:
            p.name = bytes(v).decode("utf-8", "replace")
        elif fnum == 3 and wt == 2:
            lines_raw.append(v)
        elif fnum == 4 and wt == 2:  # map<int64, XEventMetadata>
            key = None
            meta_name = None
            for f2, w2, v2 in decode_fields(bytes(v)):
                if f2 == 1 and w2 == 0:
                    key = v2
                elif f2 == 2 and w2 == 2:
                    for f3, w3, v3 in decode_fields(bytes(v2)):
                        if f3 == 1 and w3 == 0 and key is None:
                            key = v3
                        if f3 == 2 and w3 == 2:
                            meta_name = bytes(v3).decode("utf-8", "replace")
            if key is not None and meta_name is not None:
                p.event_names[key] = meta_name
    for lr in lines_raw:
        line_name = ""
        events = []
        for f2, w2, v2 in decode_fields(bytes(lr)):
            if f2 == 2 and w2 == 2:
                line_name = bytes(v2).decode("utf-8", "replace")
            elif f2 == 11 and w2 == 2:
                if not line_name:
                    line_name = bytes(v2).decode("utf-8", "replace")
            elif f2 == 4 and w2 == 2:  # XEvent
                mid = dur = off = 0
                for f3, w3, v3 in decode_fields(bytes(v2)):
                    if f3 == 1 and w3 == 0:
                        mid = v3
                    elif f3 == 2 and w3 == 0:
                        off = v3
                    elif f3 == 3 and w3 == 0:
                        dur = v3
                events.append((mid, dur, off))
        p.lines.append((line_name, events))
    return p


def load_space(path: str) -> list[Plane]:
    """Parse an XSpace file (or every .xplane.pb under a trace dir)."""
    paths = []
    if os.path.isdir(path):
        for root, _, files in os.walk(path):
            paths.extend(
                os.path.join(root, f) for f in files if f.endswith(".xplane.pb")
            )
    else:
        paths = [path]
    planes = []
    for fp in paths:
        with open(fp, "rb") as fh:
            buf = fh.read()
        for fnum, wt, v in decode_fields(buf):
            if fnum == 1 and wt == 2:
                planes.append(parse_plane(v))
    return planes


def device_planes(planes: list[Plane]) -> list[Plane]:
    sel = [
        p
        for p in planes
        if "TPU" in p.name or "/device:" in p.name or "Device" in p.name
    ]
    return sel or planes


def device_op_table(planes: list[Plane], line_filter: str | None = None):
    """{op_name: [count, total_ps]} over device-plane events."""
    table = defaultdict(lambda: [0, 0])
    for p in device_planes(planes):
        for line_name, events in p.lines:
            if line_filter and line_filter not in line_name:
                continue
            for mid, dur, _ in events:
                name = p.event_names.get(mid, f"<{mid}>")
                t = table[name]
                t[0] += 1
                t[1] += dur
    return dict(table)


def main(argv: list[str]) -> int:
    if not argv:
        print(__doc__)
        return 1
    path = argv[0]
    top = 40
    filt = None
    if "-n" in argv:
        top = int(argv[argv.index("-n") + 1])
    if "--filter" in argv:
        filt = argv[argv.index("--filter") + 1]
    planes = load_space(path)
    print(f"{len(planes)} planes:")
    for p in planes:
        total_events = sum(len(ev) for _, ev in p.lines)
        print(f"  {p.name!r}: {len(p.lines)} lines, {total_events} events")
    print()
    for p in device_planes(planes):
        print(f"== plane {p.name!r} ==")
        for line_name, events in p.lines:
            tot = sum(d for _, d, _ in events)
            print(f"  line {line_name!r}: {len(events)} events, "
                  f"{tot / 1e9:.3f} ms total")
        table = device_op_table([p])
        rows = sorted(table.items(), key=lambda kv: -kv[1][1])
        if filt:
            rows = [r for r in rows if filt in r[0]]
        print(f"  top {top} ops by total time:")
        for name, (cnt, ps) in rows[:top]:
            print(f"    {ps / 1e9:10.3f} ms  x{cnt:<6d} {name[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
