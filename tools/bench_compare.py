#!/usr/bin/env python3
"""Compare two Bench JSON lines: per-query ratio, flag >1s queries whose
runs disagree by more than 20% (the round-4 verdict's agreement bar)."""
import json, re, sys

def load(path):
    txt = open(path).read()
    m = re.search(r'\{"metric".*\}', txt)
    return json.loads(m.group(0))

a, b = load(sys.argv[1]), load(sys.argv[2])
qa, qb = a["queries"], b["queries"]
bad = []
rows = []
for k in sorted(qa, key=lambda k: -max(qa[k], qb.get(k, 0))):
    if k not in qb:
        continue
    hi, lo = max(qa[k], qb[k]), min(qa[k], qb[k])
    ratio = hi / lo if lo > 0 else float("inf")
    rows.append((k, qa[k], qb[k], ratio))
    if hi > 1.0 and ratio > 1.2:
        bad.append((k, qa[k], qb[k], ratio))
print(f"total: {a['value']:.1f}s vs {b['value']:.1f}s")
print(f"{'query':<26}{'run1':>8}{'run2':>8}{'ratio':>7}")
for k, x, y, r in rows[:25]:
    print(f"{k:<26}{x:>8.2f}{y:>8.2f}{r:>7.2f}")
print()
if bad:
    print("DISAGREE >20% on >1s queries:")
    for k, x, y, r in bad:
        print(f"  {k}: {x:.2f} vs {y:.2f} ({r:.2f}x)")
    sys.exit(1)
print("AGREEMENT OK: every >1s query within 20% across runs")
