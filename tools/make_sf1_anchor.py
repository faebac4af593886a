#!/usr/bin/env python3
"""Assemble BENCH_SF1_r{N}.json from per-mode bench_summary captures.

The sf1 anchor has two modes since round 14 (r13 verdict #3):
  clone   — target/sf1, byte-identical 10x replicas: the DUPLICATION
            stress artifact (clone-sensitive rows read their worst case)
  perturb — target/sf1p, deterministic per-replica perturbation: no
            exact clones, near-dup structure kept — TRUE data scaling

Usage: make_sf1_anchor.py OUT round sf01_anchor MODE:capture.json ...
Each capture is a bench_summary.json from a run against the matching SF
dir, tagged EXPLICITLY as clone: or perturb: (inferring the mode from
the sf path silently misfiles captures from differently-named dirs);
within a mode, earlier files win (pass timed captures before warm-only
ones). The sf0.1 anchor supplies the per-row baseline for the 10x ratio.
"""
import json, sys

out, rnd, anchor_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
anchor = json.load(open(anchor_path)).get("mins", {})

modes = {}
for spec in sys.argv[4:]:
    mode, _, p = spec.partition(":")
    if mode not in ("clone", "perturb") or not p:
        sys.exit(f"make_sf1_anchor: capture must be clone:PATH or perturb:PATH, got {spec!r}")
    d = json.load(open(p))
    rows = modes.setdefault(mode, {})
    for q, sec in d.get("mins", d.get("queries", {})).items():
        rows.setdefault(q, sec)
    # degraded rows resolve from warm-only; their value still lives in
    # "queries" — keep them, flagged
    for q in d.get("degraded", []):
        if q in d.get("queries", {}):
            rows.setdefault(q, d["queries"][q])

doc = {
    "metric": "sf1_anchor", "round": rnd,
    "modes": {
        "clone": "target/sf1 — byte-identical 10x replicas (duplication stress)",
        "perturb": "target/sf1p — per-replica token/epsilon perturbation (true data scaling)",
    },
    "protocol": "one warmup + one timed pass per row (SPARK_GRAFT_BENCH_RUNS=1), "
                "local[32], SPARK_GRAFT_BENCH_QUERY_TIMEOUT=1800",
    "unit": "sec",
    "rows": {},
}
for mode, rows in sorted(modes.items()):
    for q, sec in sorted(rows.items()):
        r = doc["rows"].setdefault(q, {"sf01_min": anchor.get(q)})
        r[mode] = round(sec, 3)
        if anchor.get(q):
            r[f"{mode}_x_per_10x"] = round(sec / anchor[q], 1)

with open(out, "w") as f:
    json.dump(doc, f, indent=1)
    f.write("\n")
print(f"wrote {out}: {len(doc['rows'])} rows, modes {sorted(modes)}")
