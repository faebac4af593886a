#!/usr/bin/env python3
"""Build target/sf1: a 10x replica of /root/testdata/sf0.1 with consistent
key offsets — the full-surface linearity probe (SURVEY paragraph 6).

Replication preserves join structure: every fact/dim key is offset by
i*OFF per replica i, so FK edges (orders->customer, lineitem->orders/
part/supplier) keep ~constant fan-out and join cardinality scales
linearly. region/nation stay as-is (bounded dims at any scale; nation
FKs are untouched). The fixed query sets (vec_id < 10, etc.) stay
replica-0-only — a fixed probe set against a 10x corpus, the realistic
scale-up. events.ts is re-cast to TIMESTAMP_NS to keep the driver data's
physical parquet type (graft.Tables.events reads nanos-as-long).

Two modes (second CLI arg):
  clone (default) — replicas i>0 carry byte-identical text/embeddings:
    the DUPLICATION stress artifact. Every clone-sensitive operator
    (x13, x81, x197, x213, x216) reads its worst case here, which
    conflates "quadratic in clones" with "quadratic in data".
  perturb — replicas i>0 get a deterministic doc-id-derived token
    appended to text and a vec-id-derived fixed-point epsilon added to
    embedding[0]: no cross-replica clones of the same source row, near-
    dup structure kept, so the anchor measures TRUE data scaling.
    Replica 0 stays pristine in both modes (fixed probe sets read
    original rows) — so it KEEPS sf0.1's planted intra-replica exact
    clones (the dedup gates need them), and distinct base rows that were
    already byte-identical can still collide across replicas when their
    derived epsilons coincide: clone-sensitive operators still see
    small, original-scale clone groups in perturb mode. "True data
    scaling" here means clone mass stays ~constant while data grows 10x,
    not that clones are absent.

Bench-only data: no oracle runs against it (hash correctness at 10x was
separately proven at sf0.1 in round 4).

Usage: make_sf1.py [dst] [clone|perturb]
"""
import duckdb, os, sys

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/target/sf1"
MODE = sys.argv[2] if len(sys.argv) > 2 else "clone"
assert MODE in ("clone", "perturb"), MODE
REPLICAS = 10
OFF = 100_000_000

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE VIEW r AS SELECT unnest(generate_series(0, {REPLICAS - 1})) AS i")

def emit(name, select):
    out = f"{DST}/{name}.parquet"
    con.execute(f"COPY ({select}) TO '{out}' (FORMAT parquet)")
    n = con.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
    print(f"{name}: {n} rows")

def src(name):
    return f"'{SRC}/{name}.parquet'"

for t in ("region", "nation"):
    emit(t, f"SELECT * FROM {src(t)}")

emit("customer", f"""
  SELECT c_custkey + i*{OFF} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM {src('customer')}, r""")
emit("supplier", f"""
  SELECT s_suppkey + i*{OFF} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM {src('supplier')}, r""")
emit("part", f"""
  SELECT p_partkey + i*{OFF} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
  FROM {src('part')}, r""")
emit("orders", f"""
  SELECT o_orderkey + i*{OFF} AS o_orderkey, o_custkey + i*{OFF} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')}, r""")
emit("lineitem", f"""
  SELECT l_orderkey + i*{OFF} AS l_orderkey, l_partkey + i*{OFF} AS l_partkey,
         l_suppkey + i*{OFF} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice,
         l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM {src('lineitem')}, r""")
emit("events", f"""
  SELECT event_id + i*{OFF} AS event_id, CAST(ts AS TIMESTAMP_NS) AS ts,
         user_id + i*{OFF} AS user_id, event_type, value, props
  FROM {src('events')}, r""")
if MODE == "clone":
    emit("documents", f"""
      SELECT doc_id + i*{OFF} AS doc_id, text, lang, source, n_chars
      FROM {src('documents')}, r""")
    emit("embeddings", f"""
      SELECT vec_id + i*{OFF} AS vec_id, embedding, label
      FROM {src('embeddings')}, r""")
else:
    # deterministic perturbation, replica 0 untouched: one appended
    # doc-id-derived token breaks text clone identity (shingle sets stay
    # ~identical — near-dup structure survives); one fixed-point epsilon
    # on embedding[0] breaks vector clone identity (epsilon = (id-mixed
    # 1..99)·1e-4, far above the 1e-6 quantization step, far below unit
    # norm — cosine neighborhoods survive)
    emit("documents", f"""
      SELECT doc_id + i*{OFF} AS doc_id,
             CASE WHEN i = 0 THEN text
                  ELSE text || ' zq' || CAST(doc_id + i*{OFF} AS VARCHAR) END AS text,
             lang, source,
             CASE WHEN i = 0 THEN n_chars
                  ELSE n_chars + 3 + length(CAST(doc_id + i*{OFF} AS VARCHAR)) END AS n_chars
      FROM {src('documents')}, r""")
    emit("embeddings", f"""
      SELECT vec_id + i*{OFF} AS vec_id,
             CASE WHEN i = 0 THEN embedding
                  ELSE list_concat(
                         [CAST(embedding[1]
                               + ((i*31 + vec_id % 59) % 99 + 1) * 0.0001 AS FLOAT)],
                         embedding[2:]) END AS embedding,
             label
      FROM {src('embeddings')}, r""")
print("done ->", DST, f"(mode={MODE})")
