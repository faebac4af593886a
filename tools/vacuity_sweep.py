#!/usr/bin/env python3
"""Vacuous-gate sweep (r12 verdict #3): a gate whose pass state is
reachable by an EMPTY or ALL-ZERO result cannot catch a broken operator
(the j4_anti_orphans pattern — an anti-join on a referentially clean
corpus passes with 0 rows no matter which key it joins on).

Scans every query output under a graft.Verify dump and classifies:
  EMPTY      0 rows                               → needs a positive control
  ALLZERO    every numeric value is 0/NULL        → needs a positive control
  ZEROROW    some row has all-zero numerics (fine — only whole-result
             zeroness is vacuous; reported for context at -v)
  NONZERO    carries substantive values           → self-evidencing

Usage: tools/vacuity_sweep.py /tmp/verify_out [-v] [--json VACUITY_rN.json]
Exit 0 always (reporting tool); the round's SURVEY §5 note records the
verdict per flagged gate, and --json commits the sweep as a per-round
artifact (r13 verdict #5: a new gate regressing to vacuous must show up
as a diff, not only in a transient stdout read).
"""
import duckdb, glob, json, os, sys

# flag-position-independent parsing: `vacuity_sweep.py -v` must not
# scan the literal directory "-v" and report a vacuous "swept 0 gates"
json_path = None
rest = []
it = iter(sys.argv[1:])
for a in it:
    if a == "--json":
        json_path = next(it, None)
        if json_path is None:
            # a silently-unwritten artifact is exactly the regression
            # path --json exists to close — fail loudly instead
            sys.exit("vacuity_sweep: --json requires a path argument")
    else:
        rest.append(a)
args = [a for a in rest if a != "-v"]
verbose = "-v" in rest
out = args[0] if args else "/tmp/verify_out"
con = duckdb.connect()

flagged, clean = [], 0
for d in sorted(glob.glob(os.path.join(out, "*"))):
    if not os.path.isdir(d):
        continue
    name = os.path.basename(d)
    try:
        rel = con.sql(f"SELECT * FROM '{d}/*.parquet'")
        n = con.sql(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
    except Exception as e:
        flagged.append((name, f"UNREADABLE {e}"))
        continue
    if n == 0:
        flagged.append((name, "EMPTY"))
        continue
    nums = [c for c, t in zip(rel.columns, rel.types)
            if str(t) in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
                          "FLOAT", "DOUBLE") or str(t).startswith("DECIMAL")]
    if not nums:
        clean += 1  # pure string/struct results: emptiness was the only risk
        continue
    checks = " AND ".join(
        f"(max(abs(coalesce(CAST(\"{c}\" AS DOUBLE), 0))) = 0)" for c in nums)
    allzero = con.sql(
        f"SELECT {checks} FROM '{d}/*.parquet'").fetchone()[0]
    if allzero:
        flagged.append((name, f"ALLZERO ({n} rows, cols={','.join(nums)})"))
    else:
        clean += 1
        if verbose:
            zr_pred = " AND ".join(
                f"(abs(coalesce(CAST(\"{c}\" AS DOUBLE), 0)) = 0)" for c in nums)
            zr = con.sql(
                f"SELECT count(*) FROM '{d}/*.parquet' WHERE {zr_pred}").fetchone()[0]
            if zr:
                print(f"  ZEROROW {name}: {zr}/{n} all-zero-numeric rows (context only)")

print(f"swept {clean + len(flagged)} gates: {clean} NONZERO-proven, "
      f"{len(flagged)} flagged")
for name, why in flagged:
    print(f"  {why:60s} {name}")

if json_path:
    with open(json_path, "w") as f:
        json.dump({"metric": "vacuity_sweep", "source": out,
                   "swept": clean + len(flagged), "nonzero_proven": clean,
                   "flagged": [{"gate": n, "why": w} for n, w in flagged]},
                  f, indent=1)
        f.write("\n")
    print(f"wrote {json_path}")
