"""xplane wire-format parser test: encode a tiny XSpace by hand (varint +
length-delimited fields per the proto schema) and check the op breakdown."""

import os

from gritlm_tpu.utils.xplane import op_breakdown, parse_xspace, summarize


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(fnum: int, payload: bytes) -> bytes:  # wire type 2
    return _varint(fnum << 3 | 2) + _varint(len(payload)) + payload


def _vfield(fnum: int, val: int) -> bytes:  # wire type 0
    return _varint(fnum << 3) + _varint(val)


def _make_xspace() -> bytes:
    # XEvent {metadata_id=1, duration_ps=3}
    ev1 = _vfield(1, 7) + _vfield(3, 2_000_000_000)  # 2 ms
    ev2 = _vfield(1, 8) + _vfield(3, 500_000_000)    # 0.5 ms
    # XLine {name=2, events=4}
    line = _field(2, b"xla-ops") + _field(4, ev1) + _field(4, ev2) + _field(4, ev1)
    # event_metadata map entry {key=1, value=XEventMetadata{id=1,name=2}}
    meta7 = _vfield(1, 7) + _field(2, _vfield(1, 7) + _field(2, b"%fusion.1"))
    meta8 = _vfield(1, 8) + _field(2, _vfield(1, 8) + _field(2, b"%copy.2"))
    # XPlane {name=2, lines=3, event_metadata=4}
    plane = (_field(2, b"/device:TPU:0") + _field(3, line)
             + _field(4, meta7) + _field(4, meta8))
    host_plane = _field(2, b"/host:CPU") + _field(3, line)
    # XSpace {planes=1}
    return _field(1, plane) + _field(1, host_plane)


def test_parse_and_breakdown(tmp_path):
    p = tmp_path / "t.xplane.pb"
    p.write_bytes(_make_xspace())
    planes = parse_xspace(str(p))
    assert [pl["name"] for pl in planes] == ["/device:TPU:0", "/host:CPU"]
    assert planes[0]["event_metadata"] == {7: "%fusion.1", 8: "%copy.2"}

    ops = op_breakdown(str(tmp_path))
    # host plane excluded; fusion.1 ran twice at 2ms, copy.2 once at 0.5ms
    assert abs(ops["%fusion.1"] - 4.0) < 1e-9
    assert abs(ops["%copy.2"] - 0.5) < 1e-9

    text = summarize(str(tmp_path), top=5)
    assert "%fusion.1" in text and "total device time" in text
