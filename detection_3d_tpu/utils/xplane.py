"""Minimal XSpace (profiler xplane.pb) parser: per-plane device time.

The JAX profiler writes XSpace protobufs; this environment ships no
python bindings for the schema, so we walk the wire format directly.
Schema (public tensorflow/tsl xplane.proto):

  XSpace  { repeated XPlane planes = 1; }
  XPlane  { int64 id = 1; string name = 2; repeated XLine lines = 3; }
  XLine   { ... repeated XEvent events = 4; }
  XEvent  { int64 metadata_id = 1; int64 offset_ps = 2;
            int64 duration_ps = 3; }

Used to measure REAL on-device execution time: on this TPU tunnel,
``block_until_ready`` returns before device completion, so wall-clock
timings measure dispatch overhead, not compute.
"""

from __future__ import annotations

from typing import Dict, List, Tuple


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


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a message buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wt == 1:  # fixed64
            val = int.from_bytes(buf[pos:pos + 8], "little")
            pos += 8
        elif wt == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:  # fixed32
            val = int.from_bytes(buf[pos:pos + 4], "little")
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def plane_event_times(xspace_bytes: bytes) -> Dict[str, float]:
    """Total event duration (seconds) per plane name."""
    out: Dict[str, float] = {}
    for f, wt, plane in _fields(xspace_bytes):
        if f != 1 or wt != 2:
            continue
        name = ""
        total_ps = 0
        for pf, pwt, pval in _fields(plane):
            if pf == 2 and pwt == 2:
                name = pval.decode("utf-8", "replace")
            elif pf == 3 and pwt == 2:  # XLine
                for lf, lwt, lval in _fields(pval):
                    if lf == 4 and lwt == 2:  # XEvent
                        for ef, ewt, eval_ in _fields(lval):
                            if ef == 3 and ewt == 0:
                                total_ps += eval_
        out[name] = out.get(name, 0.0) + total_ps / 1e12
    return out


def plane_op_times(xspace_bytes: bytes, plane_filter: str = "TPU"):
    """Per-op-name total duration (seconds) on matching planes.

    Resolves XEvent.metadata_id through XPlane.event_metadata (field 4:
    map<int64, XEventMetadata{id=1, name=2}>).
    """
    out: Dict[str, float] = {}
    for f, wt, plane in _fields(xspace_bytes):
        if f != 1 or wt != 2:
            continue
        name = ""
        meta: Dict[int, str] = {}
        lines: List[bytes] = []
        for pf, pwt, pval in _fields(plane):
            if pf == 2 and pwt == 2:
                name = pval.decode("utf-8", "replace")
            elif pf == 3 and pwt == 2:
                lines.append(pval)
            elif pf == 4 and pwt == 2:  # map entry {key=1, value=2}
                mid, mname = 0, ""
                for mf, mwt, mval in _fields(pval):
                    if mf == 1 and mwt == 0:
                        mid = mval
                    elif mf == 2 and mwt == 2:  # XEventMetadata
                        for ef, ewt, ev in _fields(mval):
                            if ef == 1 and ewt == 0:
                                mid = ev
                            elif ef == 2 and ewt == 2:
                                mname = ev.decode("utf-8", "replace")
                meta[mid] = mname
        if plane_filter.lower() not in name.lower():
            continue
        for lval in lines:
            for lf, lwt, le in _fields(lval):
                if lf == 4 and lwt == 2:
                    mid = 0
                    dur = 0
                    for ef, ewt, ev in _fields(le):
                        if ef == 1 and ewt == 0:
                            mid = ev
                        elif ef == 3 and ewt == 0:
                            dur = ev
                    key = meta.get(mid, f"id{mid}")
                    out[key] = out.get(key, 0.0) + dur / 1e12
    return out


def device_time_seconds(trace_dir: str) -> Dict[str, float]:
    """Parse all xplane files under a profiler trace dir."""
    import glob

    out: Dict[str, float] = {}
    for path in glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True):
        with open(path, "rb") as f:
            for name, secs in plane_event_times(f.read()).items():
                out[name] = out.get(name, 0.0) + secs
    return out


def tpu_module_time(trace_dir: str) -> float:
    """Total 'XLA Modules' line time on TPU planes — the true program
    envelope (op-line events overlap with async DMA and nest inside
    whiles, so summing them overcounts)."""
    import glob

    total = 0.0
    for path in glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True):
        with open(path, "rb") as f:
            buf = f.read()
        for fnum, wt, plane in _fields(buf):
            if fnum != 1 or wt != 2:
                continue
            pname = ""
            lines = []
            for pf, pwt, pval in _fields(plane):
                if pf == 2 and pwt == 2:
                    pname = pval.decode("utf-8", "replace")
                elif pf == 3 and pwt == 2:
                    lines.append(pval)
            if "tpu" not in pname.lower():
                continue
            for lval in lines:
                lname = ""
                ltotal = 0
                for lf, lwt, le in _fields(lval):
                    if lf in (2, 11) and lwt == 2:
                        lname = le.decode("utf-8", "replace")
                    elif lf == 4 and lwt == 2:
                        for ef, ewt, ev in _fields(le):
                            if ef == 3 and ewt == 0:
                                ltotal += ev
                if lname == "XLA Modules":
                    total += ltotal / 1e12
    return total


def tpu_device_time(trace_dir: str) -> float:
    """True TPU program time (module envelope)."""
    return tpu_module_time(trace_dir)
