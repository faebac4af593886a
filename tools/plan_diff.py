#!/usr/bin/env python3
"""Diff two PlanDump fingerprint files (PLANS_r{N}.json).

For every query present in both files, compare the operator multiset and
the per-scan facts; print one line per changed query with the op-count
deltas (e.g. `x13_ann_topk: +SortMergeJoin(inner) x1, -BroadcastHashJoin
(inner) x1`) and any scan whose pushed/partition-filter/read-column
counts moved. Queries only in one file are listed as added/removed.

Exit code: 0 when nothing changed, 1 when any query differs — the
closing gate runs this against the previous round's committed baseline
and annotates intentional changes in SURVEY §6.1.

Usage: plan_diff.py OLD.json NEW.json [--ignore q1,q2]
  --ignore  queries whose change is intentional this round (still
            printed, marked "(annotated)", but don't fail the gate)
"""
import json, sys

args = [a for a in sys.argv[1:] if not a.startswith("--ignore")]
ignore = set()
for i, a in enumerate(sys.argv[1:]):
    if a == "--ignore" and i + 2 < len(sys.argv):
        ignore = set(x.strip() for x in sys.argv[i + 2].split(",") if x.strip())
    elif a.startswith("--ignore="):
        ignore = set(x.strip() for x in a.split("=", 1)[1].split(",") if x.strip())
old, new = (json.load(open(p)) for p in args[:2])

changed, annotated = [], []
for q in sorted(set(old) | set(new)):
    if q not in old:
        changed.append((q, ["added this round"])); continue
    if q not in new:
        changed.append((q, ["removed this round"])); continue
    o, n = old[q], new[q]
    if "err" in o or "err" in n:
        if o.get("err") != n.get("err"):
            changed.append((q, [f"err: {o.get('err')!r} -> {n.get('err')!r}"]))
        continue
    deltas = []
    oops, nops = o.get("ops", {}), n.get("ops", {})
    for op in sorted(set(oops) | set(nops)):
        d = nops.get(op, 0) - oops.get(op, 0)
        if d:
            deltas.append(f"{'+' if d > 0 else '-'}{op} x{abs(d)}")
    oscan, nscan = o.get("scans", []), n.get("scans", [])
    if oscan != nscan:
        key = lambda s: (s.get("format"), s.get("pushed"), s.get("partFilters"), s.get("readCols"))
        om, nm = sorted(map(key, oscan)), sorted(map(key, nscan))
        if om != nm:
            deltas.append(f"scans: {om} -> {nm}")
    if deltas:
        (annotated if q in ignore else changed).append((q, deltas))

for bucket, label in ((changed, ""), (annotated, " (annotated)")):
    for q, deltas in bucket:
        print(f"{q}{label}: " + "; ".join(deltas))
flagged = set(q for q, _ in changed) | set(q for q, _ in annotated)
same = len((set(old) & set(new)) - flagged)
print(f"[plan_diff] {same} unchanged, {len(annotated)} annotated, "
      f"{len(changed)} UNEXPECTED of {len(set(old) | set(new))} total")
sys.exit(1 if changed else 0)
