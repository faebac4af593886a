#!/usr/bin/env python3
"""Consolidate committed bench anchors into BENCH_ANCHOR.json.

Per-row anchor = MIN across every input artifact's per-row `mins` map
(a min can only overstate performance, never understate it — so the
cross-artifact min is the cleanest host-pressure-free estimate of each
row's cost). graft.Bench reads this file to pick the timed tier each
round (heavy rows every round, long tail rotating by thirds) and to
carry anchor values for the rotated-out rows in the artifact.

Usage: tools/make_anchor.py [out] [in1 in2 ...]
Defaults: out=BENCH_ANCHOR.json, in=BENCH_ANCHOR_r12.json BENCH_ANCHOR_r12b.json
Re-run with a new full-surface artifact appended whenever one is taken.
"""
import json, sys

out = sys.argv[1] if len(sys.argv) > 1 else "BENCH_ANCHOR.json"
ins = sys.argv[2:] or ["BENCH_ANCHOR_r12.json", "BENCH_ANCHOR_r12b.json"]

mins = {}
for f in ins:
    d = json.load(open(f))
    for k, v in d.get("mins", {}).items():
        if k not in mins or v < mins[k]:
            mins[k] = v

json.dump({"source": ins, "n": len(mins), "mins": dict(sorted(mins.items()))},
          open(out, "w"), indent=1)
print(f"{out}: {len(mins)} rows, total_min {sum(mins.values()):.1f}s from {ins}")
