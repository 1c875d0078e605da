#!/usr/bin/env python3
"""Summarize a jax.profiler xplane trace: top ops by total self time.

Pairs with the `-profile` flag (which writes
<output_dir>/profile/.../*.xplane.pb during training) or any
`jax.profiler.trace` capture.  Parses with jax.profiler.ProfileData — no
TensorBoard needed — and prints per-op totals for the TPU device planes,
which is how the decode-step and conv-backward breakdowns in
docs/performance.md were measured.

Usage: python tools/xplane_top.py <trace.xplane.pb | profile_dir> [top_n]
"""

import os
import sys
from collections import defaultdict


def find_xplane(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = []
    for root, _dirs, files in os.walk(path):
        hits += [os.path.join(root, f) for f in files
                 if f.endswith(".xplane.pb")]
    if not hits:
        raise SystemExit(f"no .xplane.pb under {path}")
    return max(hits, key=os.path.getmtime)


def main():
    from jax.profiler import ProfileData

    path = find_xplane(sys.argv[1])
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    with open(path, "rb") as f:
        data = ProfileData.from_serialized_xspace(f.read())

    def short(name: str) -> str:
        # '%fusion.123 = f32[...] fusion(...), kind=kOutput ...' ->
        # 'fusion.123 f32[...]'
        if name.startswith("%"):
            head, _, rest = name[1:].partition(" = ")
            shape = rest.split(" ")[0] if rest else ""
            return f"{head} {shape}"
        return name

    for plane in data.planes:
        pname = plane.name
        # device planes hold the XLA op events; skip host/python planes
        if not ("TPU" in pname or "Device" in pname or "/device:" in pname):
            continue
        # each plane has several lines (Steps / XLA Modules / XLA Ops /
        # TraceMe) describing the SAME wall time at different granularity
        # — summing across them double-counts; use the op-level line.
        lines = {ln.name: ln for ln in plane.lines}
        if not lines:
            continue
        op_line = None
        for key in ("XLA Ops", "XLA:op"):
            if key in lines:
                op_line = lines[key]
        if op_line is None:  # fall back to the busiest line
            op_line = max(lines.values(), key=lambda ln: len(list(ln.events)))
        totals = defaultdict(float)
        count = defaultdict(int)
        plane_total = 0.0
        for ev in op_line.events:
            dur = ev.duration_ns
            key = short(ev.name)
            totals[key] += dur
            count[key] += 1
            plane_total += dur
        if not totals:
            continue
        print(f"\n== {pname} [{op_line.name}] "
              f"(total {plane_total / 1e6:.2f} ms across "
              f"{sum(count.values())} events) ==")
        for op, ns in sorted(totals.items(), key=lambda kv: -kv[1])[:top_n]:
            print(f"  {op[:90]:<90}  {ns / 1e6:9.3f} ms  "
                  f"x{count[op]:<5d} {ns / plane_total * 100:5.1f}%")


if __name__ == "__main__":
    main()
