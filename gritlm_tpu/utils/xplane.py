"""Minimal XSpace/XPlane trace reader: per-op device-time breakdown.

`jax.profiler` writes `*.xplane.pb` traces meant for TensorBoard's profile
plugin, which isn't always importable (version-locked to TF). This is a
self-contained protobuf *wire-format* parser for just the fields needed to
aggregate device-op durations — no generated protos, no TF. Used by the
perf workflow: capture with utils.profiling.trace(dir), summarize with
`op_breakdown(dir)`; CLI `python -m gritlm_tpu.utils.xplane <trace_dir>`.

Field numbers follow tensorflow/tsl profiler protobuf/xplane.proto:
  XSpace.planes=1; XPlane{id=1,name=2,lines=3,event_metadata=4};
  XLine{name=2,events=4}; XEvent{metadata_id=1,duration_ps=3};
  XEventMetadata map entry {key=1,value=2}, XEventMetadata{id=1,name=2}.
"""

from __future__ import annotations

import glob
import os
from collections import defaultdict
from typing import Dict, Iterator, List, Tuple


def _varint(buf: bytes, i: int) -> Tuple[int, int]:
    out = shift = 0
    while True:
        b = buf[i]
        out |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return out, i
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a message buffer."""
    i, n = 0, len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            val, i = _varint(buf, i)
        elif wt == 2:  # length-delimited
            ln, i = _varint(buf, i)
            val = buf[i:i + ln]
            i += ln
        elif wt == 5:  # 32-bit
            val = buf[i:i + 4]
            i += 4
        elif wt == 1:  # 64-bit
            val = buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fnum, wt, val


def _parse_event(buf: bytes) -> Tuple[int, int]:
    meta_id = dur_ps = 0
    for fnum, _, val in _fields(buf):
        if fnum == 1:
            meta_id = val
        elif fnum == 3:
            dur_ps = val
    return meta_id, dur_ps


def _parse_line(buf: bytes) -> Tuple[str, List[Tuple[int, int]]]:
    name, events = "", []
    for fnum, _, val in _fields(buf):
        if fnum == 2:
            name = val.decode("utf-8", "replace")
        elif fnum == 4:
            events.append(_parse_event(val))
    return name, events


def _parse_meta_entry(buf: bytes) -> Tuple[int, str]:
    key, name = 0, ""
    for fnum, _, val in _fields(buf):
        if fnum == 1:
            key = val
        elif fnum == 2:  # XEventMetadata
            for f2, _, v2 in _fields(val):
                if f2 == 2:
                    name = v2.decode("utf-8", "replace")
    return key, name


def parse_plane(buf: bytes) -> dict:
    name, lines, meta = "", [], {}
    for fnum, _, val in _fields(buf):
        if fnum == 2:
            name = val.decode("utf-8", "replace")
        elif fnum == 3:
            lines.append(_parse_line(val))
        elif fnum == 4:
            k, v = _parse_meta_entry(val)
            meta[k] = v
    return {"name": name, "lines": lines, "event_metadata": meta}


def parse_xspace(path: str) -> List[dict]:
    with open(path, "rb") as f:
        buf = f.read()
    return [parse_plane(val) for fnum, _, val in _fields(buf) if fnum == 1]


def find_trace_files(trace_dir: str) -> List[str]:
    return sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))


def op_breakdown(trace_dir: str, device_only: bool = True) -> Dict[str, float]:
    """op/fusion name → total milliseconds across device planes."""
    totals: Dict[str, float] = defaultdict(float)
    for path in find_trace_files(trace_dir):
        for plane in parse_xspace(path):
            pname = plane["name"]
            if device_only and not ("TPU" in pname or "/device:" in pname
                                    or "gpu" in pname.lower()):
                continue
            meta = plane["event_metadata"]
            for _, events in plane["lines"]:
                for meta_id, dur_ps in events:
                    totals[meta.get(meta_id, f"op_{meta_id}")] += dur_ps / 1e9
    return dict(totals)


def summarize(trace_dir: str, top: int = 25) -> str:
    ops = sorted(op_breakdown(trace_dir).items(), key=lambda kv: -kv[1])
    total = sum(ms for _, ms in ops)
    lines = [f"total device time: {total:.3f} ms  ({len(ops)} distinct ops)"]
    for name, ms in ops[:top]:
        lines.append(f"{ms:9.3f} ms  {100 * ms / total:5.1f}%  {name[:110]}")
    return "\n".join(lines)


def main(argv=None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args(argv)
    print(summarize(args.trace_dir, args.top))


if __name__ == "__main__":
    main()
