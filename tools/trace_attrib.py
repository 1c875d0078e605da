#!/usr/bin/env python3
"""Join an xplane-top listing to the optimized-HLO dump: for each traced op,
print its per-step ms, HLO kind, fused op_name metadata and source line —
so trace costs get attributed to real graph work, not guessed from names.

Usage: python tools/trace_attrib.py TRACE_LOG HLO_TXT [steps] [top_n]
  TRACE_LOG: output of tools/trace_step.py (xplane_top listing)
  HLO_TXT:   dump from tools/dump_hlo.py (optimized HLO text)
"""

import re
import sys


def parse_trace(path):
    rows = []
    pat = re.compile(r"^\s{2}(\S+) .*?(\d+\.\d+) ms\s+x(\d+)")
    for line in open(path):
        m = pat.match(line)
        if m:
            rows.append((m.group(1), float(m.group(2)), int(m.group(3))))
    return rows


def parse_trace_shapes(path):
    """trace_step rows with the output shape token the listing carries."""
    rows = []
    pat = re.compile(r"^\s{2}(\S+)\s+(\S*?)\s*(\d+\.\d+) ms\s+x(\d+)")
    for line in open(path):
        m = pat.match(line)
        if m:
            shape = m.group(2).lstrip("(").rstrip(",")
            rows.append((m.group(1), shape, float(m.group(3)),
                         int(m.group(4))))
    return rows


def lookup(ops, name, shape):
    """Shape-verified join: the traced program and the dump_hlo program
    can assign DIFFERENT fusion numbers (any graph difference shifts
    them), so an exact name hit can be the WRONG op — require the dump
    line to carry the trace row's output shape+layout, trying name
    offsets around the trace number."""
    base = name.split("(")[0]
    cands = [base]
    m = re.match(r"(.*?)(\d+)$", base)
    if m:
        stem, num = m.group(1), int(m.group(2))
        cands += ["%s%d" % (stem, num + d)
                  for d in (-1, 1, -2, 2, -3, 3) if num + d >= 0]
    for c in cands:
        line = ops.get(c)
        if line and (not shape or shape in line):
            return line
    return ""


def parse_hlo(path):
    ops = {}
    pat = re.compile(r"^\s*(?:ROOT )?%([\w.\-]+) = ")
    for line in open(path):
        m = pat.match(line)
        if m:
            ops[m.group(1)] = line.strip()
    return ops


def describe(line):
    kind = ""
    m = re.search(r"kind=(k\w+)", line)
    if m:
        kind = m.group(1)
    opname = ""
    m = re.search(r'op_name="([^"]+)"', line)
    if m:
        opname = m.group(1).replace("jit(<lambda>)/jit(<unknown>)/", "")
    src = ""
    m = re.search(r'source_file="([^"]+)" source_line=(\d+)', line)
    if m:
        src = "%s:%s" % (m.group(1).split("/")[-1], m.group(2))
    emitter = ""
    m = re.search(r'"emitter":"(\w+)"', line)
    if m:
        emitter = m.group(1)
    shape = ""
    m = re.search(r"= (\(?[\w,\[\]{}():\s]+?\)?) (?:fusion|custom-call|"
                  r"select-and-scatter|copy|convert|pad|slice|while|dot)\(",
                  line)
    if m:
        shape = re.sub(r"\{[^}]*\}", "", m.group(1))[:48]
    return kind, opname, src, emitter, shape


def main():
    trace_log, hlo_txt = sys.argv[1], sys.argv[2]
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    top_n = int(sys.argv[4]) if len(sys.argv) > 4 else 60
    ops = parse_hlo(hlo_txt)
    rows = parse_trace_shapes(trace_log)[:top_n]
    total = 0.0
    for name, tshape, ms, _x in rows:
        per = ms / steps
        total += per
        line = lookup(ops, name, tshape)
        kind, opname, src, emitter, shape = describe(line) if line else (
            "?", "", "", "", "")
        print("%7.3f  %-38s %-8s %-44s %-24s %s" % (
            per, name[:38], kind, opname[:44], src, emitter))
    print("# top-%d sum: %.2f ms/step" % (top_n, total))


if __name__ == "__main__":
    main()
