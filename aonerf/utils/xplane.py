"""Minimal XSpace (xplane.pb) reader: per-op device time from jax.profiler.

The reference's only profiling is Lightning's ``profiler="simple"``
(run.py:108,128). Here ``jax.profiler.start_trace`` captures device traces;
this module parses the resulting ``*.xplane.pb`` without TensorFlow or
tensorboard-plugin-profile (whose bundled generated protos are incompatible
with this image's protobuf), by walking the protobuf wire format directly
against the stable XSpace schema (tsl/profiler/protobuf/xplane.proto):

  XSpace.planes=1 -> XPlane{name=2, lines=3, event_metadata=4(map)}
  XLine{name=2, events=4} ; XEvent{metadata_id=1, duration_ps=3}
  XEventMetadata map entry {key=1, value=2} ; XEventMetadata{id=1, name=2}

Only the fields needed for op-time aggregation are decoded; everything else
is skipped by wire type.
"""

import glob
import os
from typing import Dict, Iterator, List, Optional, Tuple


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


def _fields(buf: bytes) -> Iterator[Tuple[int, int, bytes]]:
    """Yield (field_number, wire_type, payload) over a message buffer.
    Payload is the raw varint value (as int-encoded bytes via int) for wire
    type 0, the sub-buffer for type 2, and fixed bytes for types 1/5."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
            yield field, wire, val
        elif wire == 2:
            length, pos = _read_varint(buf, pos)
            yield field, wire, buf[pos : pos + length]
            pos += length
        elif wire == 1:
            yield field, wire, buf[pos : pos + 8]
            pos += 8
        elif wire == 5:
            yield field, wire, buf[pos : pos + 4]
            pos += 4
        else:  # groups (3/4): not used by xplane
            raise ValueError(f"unsupported wire type {wire}")


class Plane:
    def __init__(self, name: str):
        self.name = name
        # op name -> (total_ps, occurrences), summed over all lines
        self.op_time_ps: Dict[str, int] = {}
        self.op_count: Dict[str, int] = {}
        self.total_ps: int = 0

    def top(self, k: int = 30) -> List[Tuple[str, int, int]]:
        rows = sorted(self.op_time_ps.items(), key=lambda kv: -kv[1])[:k]
        return [(name, ps, self.op_count[name]) for name, ps in rows]


def _parse_event_metadata(buf: bytes) -> Tuple[int, str]:
    meta_id, name = 0, ""
    for field, wire, val in _fields(buf):
        if field == 1 and wire == 0:
            meta_id = val
        elif field == 2 and wire == 2:
            name = val.decode("utf-8", "replace")
    return meta_id, name


def _parse_plane(buf: bytes) -> Plane:
    name = ""
    metadata: Dict[int, str] = {}
    lines: List[bytes] = []
    for field, wire, val in _fields(buf):
        if field == 2 and wire == 2:
            name = val.decode("utf-8", "replace")
        elif field == 3 and wire == 2:
            lines.append(val)
        elif field == 4 and wire == 2:  # map<int64, XEventMetadata>
            key, meta = 0, b""
            for f2, w2, v2 in _fields(val):
                if f2 == 1 and w2 == 0:
                    key = v2
                elif f2 == 2 and w2 == 2:
                    meta = v2
            mid, mname = _parse_event_metadata(meta)
            metadata[key or mid] = mname
    plane = Plane(name)
    for line_buf in lines:
        for field, wire, val in _fields(line_buf):
            if field == 4 and wire == 2:  # XEvent
                mid, dur = 0, 0
                for f2, w2, v2 in _fields(val):
                    if f2 == 1 and w2 == 0:
                        mid = v2
                    elif f2 == 3 and w2 == 0:
                        dur = v2
                opname = metadata.get(mid, f"<meta {mid}>")
                plane.op_time_ps[opname] = plane.op_time_ps.get(opname, 0) + dur
                plane.op_count[opname] = plane.op_count.get(opname, 0) + 1
                plane.total_ps += dur
    return plane


def parse_xspace(path: str) -> List[Plane]:
    """Parse one .xplane.pb file into a list of Planes."""
    with open(path, "rb") as f:
        buf = f.read()
    planes = []
    for field, wire, val in _fields(buf):
        if field == 1 and wire == 2:
            planes.append(_parse_plane(val))
    return planes


def latest_trace(trace_dir: str) -> Optional[str]:
    """Newest *.xplane.pb under a jax.profiler.start_trace output dir."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    return max(paths, key=os.path.getmtime) if paths else None


def device_op_table(trace_dir: str, top_k: int = 30) -> str:
    """Human-readable per-op device-time table for the newest trace."""
    path = latest_trace(trace_dir)
    if path is None:
        return f"(no xplane.pb under {trace_dir})"
    out = []
    for plane in parse_xspace(path):
        if not plane.op_time_ps:
            continue
        out.append(
            f"== {plane.name}: {plane.total_ps / 1e9:.3f} ms total device time"
        )
        for name, ps, cnt in plane.top(top_k):
            out.append(
                f"{ps / 1e9:10.3f} ms {100 * ps / plane.total_ps:5.1f}% "
                f"x{cnt:<6} {name[:100]}"
            )
    return "\n".join(out)
