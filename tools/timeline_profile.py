#!/usr/bin/env python
"""Critical-path timeline analysis of a profiler trace.

`tools/op_profile.py` sums op durations, but async DMA overlaps compute,
so the sums cannot say what the device is actually WAITING on. This tool
reconstructs the TPU timeline from the xplane trace:

  * sync compute time is attributed to the INNERMOST op on the "XLA Ops"
    line (fusions nest inside whiles etc.);
  * gaps in the compute line within the module envelope are DMA/host
    stalls; each gap is attributed to the "Async XLA Ops" events that
    overlap it (the transfers the core is waiting for).

Usage: python tools/timeline_profile.py [trace_dir] [--top 20]
       (default trace dir: /tmp/op_profile_trace — run op_profile first)
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from detection_3d_tpu.utils.xplane import _fields  # noqa: E402


def parse_tpu_lines(path):
    """-> dict line_name -> list[(offset_ps, dur_ps, op_name)] on the TPU
    device plane."""
    buf = open(path, "rb").read()
    out = {}
    for f, wt, plane in _fields(buf):
        if f != 1 or wt != 2:
            continue
        pname = ""
        meta = {}
        lines = []
        for pf, pwt, pval in _fields(plane):
            if pf == 2 and pwt == 2:
                pname = pval.decode("utf-8", "replace")
            elif pf == 3 and pwt == 2:
                lines.append(pval)
            elif pf == 4 and pwt == 2:
                mid, mname = 0, ""
                for mf, mwt, mval in _fields(pval):
                    if mf == 1 and mwt == 0:
                        mid = mval
                    elif mf == 2 and mwt == 2:
                        for ef, ewt, ev in _fields(mval):
                            if ef == 1 and ewt == 0:
                                mid = ev
                            elif ef == 2 and ewt == 2:
                                mname = ev.decode("utf-8", "replace")
                meta[mid] = mname
        if "tpu" not in pname.lower():
            continue
        for lval in lines:
            lname = ""
            evs = []
            # line timestamp base (field 3: timestamp_ns)
            base_ns = 0
            for lf, lwt, le in _fields(lval):
                if lf in (2, 11) and lwt == 2:
                    lname = le.decode("utf-8", "replace")
                elif lf == 3 and lwt == 0:
                    base_ns = le
                elif lf == 4 and lwt == 2:
                    mid = off = dur = 0
                    for ef, ewt, ev in _fields(le):
                        if ef == 1 and ewt == 0:
                            mid = ev
                        elif ef == 2 and ewt == 0:
                            off = ev
                        elif ef == 3 and ewt == 0:
                            dur = ev
                    evs.append((base_ns * 1000 + off, dur,
                                meta.get(mid, f"id{mid}")))
            if evs:
                out.setdefault(lname, []).extend(evs)
    return out


def innermost_attribution(events):
    """Attribute each instant to the innermost (shortest-enclosing) op.

    events: [(start_ps, dur_ps, name)]. Sweep: sort boundaries; maintain
    a stack by containment (events nest on this line).
    """
    # boundary sweep with interval stack
    starts = sorted(events, key=lambda e: (e[0], -e[1]))
    excl = collections.Counter()
    stack = []  # (end_ps, name)
    cur_t = None
    for s, d, name in starts:
        e = s + d
        # pop finished intervals, attributing their tail
        while stack and stack[-1][0] <= s:
            pe, pn = stack.pop()
            t0 = max(cur_t, 0)
            if pe > t0:
                excl[pn] += pe - t0
                cur_t = pe
        if stack and cur_t is not None and s > cur_t:
            excl[stack[-1][1]] += s - cur_t
        cur_t = s if cur_t is None else max(cur_t, s)
        stack.append((e, name))
        stack.sort()
    while stack:
        pe, pn = stack.pop(0)
        if pe > cur_t:
            excl[pn] += pe - cur_t
            cur_t = pe
    return excl


def union_intervals(events):
    ivs = sorted((s, s + d) for s, d, _ in events)
    merged = []
    for s, e in ivs:
        if merged and s <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], e))
        else:
            merged.append((s, e))
    return merged


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir", nargs="?", default="/tmp/op_profile_trace")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()

    paths = glob.glob(args.trace_dir + "/**/*.xplane.pb", recursive=True)
    if not paths:
        sys.exit(f"no xplane.pb under {args.trace_dir}")
    lines = parse_tpu_lines(paths[0])
    mods = lines.get("XLA Modules", [])
    ops = lines.get("XLA Ops", [])
    aops = lines.get("Async XLA Ops", [])
    if not mods or not ops:
        sys.exit(f"missing lines; have {list(lines)}")

    m0 = min(s for s, d, _ in mods)
    m1 = max(s + d for s, d, _ in mods)
    print(f"module envelope: {(m1 - m0) / 1e12:.4f}s "
          f"({len(mods)} modules)")

    def short(n):
        import re
        m = re.match(r"%?([a-zA-Z_\-]+[a-zA-Z_])[.0-9]*", n)
        return m.group(1) if m else n[:32]

    # 1) sync compute, innermost attribution
    excl = innermost_attribution(ops)
    agg = collections.Counter()
    for n, t in excl.items():
        agg[short(n)] += t
    busy = union_intervals(ops)
    busy_ps = sum(e - s for s, e in busy)
    print(f"\ncompute-line busy: {busy_ps / 1e12:.4f}s "
          f"({100.0 * busy_ps / (m1 - m0):.1f}% of envelope)")
    print("exclusive (innermost) compute by op kind:")
    for k, t in agg.most_common(args.top):
        print(f"  {t / 1e12:8.4f}s  {k}")

    # 2) gaps: envelope minus busy
    gaps = []
    prev = m0
    for s, e in busy:
        if s > prev:
            gaps.append((prev, s))
        prev = max(prev, e)
    if m1 > prev:
        gaps.append((prev, m1))
    gap_ps = sum(e - s for s, e in gaps)
    print(f"\ncompute gaps total: {gap_ps / 1e12:.4f}s in "
          f"{len(gaps)} gaps")

    # attribute gaps to overlapping async ops (proportional to overlap)
    aevs = sorted(aops)
    gag = collections.Counter()
    import bisect
    astarts = [s for s, d, n in aevs]
    for gs, ge in gaps:
        i = bisect.bisect_right(astarts, ge)
        overl = []
        for s, d, n in aevs[max(0, i - 400):i]:
            o = min(ge, s + d) - max(gs, s)
            if o > 0:
                overl.append((o, n))
        tot = sum(o for o, _ in overl)
        if tot <= 0:
            gag["(no async overlap — host/sync)"] += ge - gs
        else:
            for o, n in overl:
                gag[short(n)] += (ge - gs) * o / tot
    print("gap time attributed to async ops (proportional):")
    for k, t in gag.most_common(args.top):
        print(f"  {t / 1e12:8.4f}s  {k}")

    # biggest individual gaps with their overlapping async ops
    print("\nlargest gaps:")
    for gs, ge in sorted(gaps, key=lambda g: g[0] - g[1])[:8]:
        over = [n for s, d, n in aevs
                if min(ge, s + d) - max(gs, s) > 0.3 * (ge - gs)]
        print(f"  {(ge - gs) / 1e12 * 1e3:7.2f}ms at "
              f"+{(gs - m0) / 1e12 * 1e3:8.2f}ms: "
              f"{[n[:90] for n in over[:3]]}")


if __name__ == "__main__":
    main()
