package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.util.Det._
import graft.clean.Cleaning
import graft.dims.DateDim

/** The relational query surface of SURVEY §2 (scans, projections, filters,
  * joins, aggregates, dedup, windows), expressed Spark-first on the
  * driver's TPC-H-ish test tables.
  *
  * Determinism contract (driver hash-compares against DuckDB):
  *   - every query ends in a total ORDER BY over non-null keys;
  *   - every double aggregate goes through graft.util.Det (exact decimal
  *     sums, double conversion last);
  *   - column names are aliased identically here and in `oracles`.
  */
object Relational {

  private def yr(c: String) = year(col(c))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // S3 (`quality_checks.py:88`): parquet scan with pushed filter + pruned columns.
    "s3_parquet_scan" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
        .filter(col("l_quantity") > 25)
        .orderBy("l_orderkey", "l_linenumber")),

    // S5 (`DB.sql:117-121` FROM clauses): spark.sql over registered views —
    // the SQL entry point must match the Dataset API (SURVEY §3.3).
    "s5_sql_scan" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT o_orderstatus, count(*) AS n
               FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    }),

    // K5 (`DB.sql:11-18,37-45`): INSERT…SELECT dim load — project/rename,
    // write to warehouse storage, read back.
    "k5_insert_select" -> ((s, d) => {
      val dim = Tables.customer(s, d).select(
        col("c_custkey").as("customer_id"),
        col("c_name").as("customer_name"),
        col("c_nationkey").as("nation_id"),
        col("c_acctbal").as("acct_balance"),
        col("c_mktsegment").as("segment"))
      val tgt = sys.props("java.io.tmpdir") + "/graft_warehouse/customer_dim"
      dim.write.mode("overwrite").parquet(tgt)
      s.read.parquet(tgt).orderBy("customer_id")
    }),

    // P1 (`DB.sql:12-17`): projection + rename into Transaction_dim shape.
    "p1_project_rename" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey").as("transaction_id"),
        col("o_orderdate").cast("date").as("transaction_date"),
        col("o_totalprice").as("transaction_amount"),
        col("o_orderpriority").as("narration"))
        .orderBy("transaction_id")),

    // P2 (`spark_etl.py:33-34,42-43`): single-pass withColumns cast/rewrite.
    "p2_cast_rewrite" -> ((s, d) =>
      Tables.orders(s, d)
        .withColumns(Map(
          "order_date" -> col("o_orderdate").cast("date"),
          "total_cents" -> (col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")))
        .select("o_orderkey", "order_date", "total_cents")
        .orderBy("o_orderkey")),

    // P3 (`spark_etl.py:85-88`): NOT NULL key filter.
    "p3_filter_notnull" -> ((s, d) =>
      Cleaning.dropNullKey(Tables.events(s, d), "user_id")
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")),

    // P4 (`spark_etl.py:143-144`, fixed per SURVEY §4 O-3): incremental
    // high-watermark on a real source column so the predicate pushes down.
    "p4_incremental_hwm" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") > lit(500L))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")),

    // P5 (`spark_etl.py:24-25`): LIKE predicates.
    "p5_like" -> ((s, d) =>
      Tables.part(s, d)
        .filter(col("p_brand").like("Brand#1%") || col("p_type").like("%ECO%"))
        .select("p_partkey", "p_brand", "p_type")
        .orderBy("p_partkey")),

    // P6 (`spark_etl.py:22-27`): CASE WHEN bucketing.
    "p6_case_when" -> ((s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        Cleaning.bucket(col("c_acctbal"),
          Seq((0.0, "negative"), (1000.0, "low"), (5000.0, "mid")), "high").as("bal_bucket"))
        .orderBy("c_custkey")),

    // P8/D4 (`DB.sql:21,48,106`): ordered LIMIT → TakeOrderedAndProject.
    "p8_limit_topk" -> ((s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(5)),

    // J1 (`DB.sql:117-119`): fact ⋈ broadcast dim + rollup.
    "j1_dim_fact_join" -> ((s, d) =>
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
        .orderBy("c_mktsegment")),

    // J2/A4 (`DB.sql:109-124`, completed GROUP BY per SURVEY §8.6):
    // 3-table star join + hash-aggregate rollup. Flagship query.
    "j2_star3_rollup" -> ((s, d) =>
      // the fact-side join probe + partial rollup run inside the scan
      // stage — widen the single-row-group gate input (identity at
      // production widths; measured 1.5 -> 1.1 s; see ScanTuning)
      graft.util.ScanTuning.ensureParallelism(
          Tables.lineitem(s, d), col("l_orderkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), yr("o_orderdate").as("order_year"), col("l_returnflag"))
        .agg(
          count(lit(1)).as("n_lines"),
          dsum(col("l_quantity")).as("sum_qty"),
          dsumExpr(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy("c_mktsegment", "order_year", "l_returnflag")),

    // J3/A7 (`Diagrams/Data Model.png` LOAN_DATE_ID edge; monthly-trend chart):
    // fact ⋈ broadcast date dimension, chronological month rollup.
    "j3_date_dim_join" -> ((s, d) => {
      val dates = DateDim.fromColumn(Tables.orders(s, d), "o_orderdate")
      Tables.orders(s, d)
        .withColumn("date_id", date_format(col("o_orderdate"), "yyyyMMdd").cast("int"))
        .join(broadcast(dates), Seq("date_id"))
        .groupBy("year", "month", "month_name")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
        .orderBy("year", "month")
    }),

    // §2.4 note + §5: left-anti orphan-FK check (customers with no orders).
    // NOTE: the generated testdata is referentially clean, so this gate
    // passes with 0 rows — the POSITIVE control lives in j4b below (and
    // in OrphanScanSpec's planted-orphan test).
    "j4_anti_orphans" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // j4's positive control (r12 verdict #1): the SAME anti-join against a
    // ghost-key orders set (orders of %3==0 custkeys dropped) — every
    // %3==0 customer that HAS orders becomes an orphan, so the gate
    // hash-checks a nonzero result; a wrong key or flipped direction can
    // no longer hide behind a clean corpus.
    "j4b_orphans_planted" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_custkey") % 3 =!= 0),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // A1/A2/A3/A11 (`spark_etl.py:127`; `quality_checks.py:26-29`; KPI cards):
    // global watermark + volume + uniqueness + KPI aggregates in one pass.
    "a1_kpi_global" -> ((s, d) =>
      Tables.orders(s, d).agg(
        max(col("o_orderkey")).as("max_key"),
        count(lit(1)).as("n_rows"),
        countDistinct(col("o_custkey")).as("n_cust"),
        dsum(col("o_totalprice")).as("sum_total"),
        min(col("o_totalprice")).as("min_total"),
        max(col("o_totalprice")).as("max_total"))),

    // A6 (dashboard chart 1): sum/avg by category.
    "a6_sum_avg_by_seg" -> ((s, d) =>
      Tables.customer(s, d)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), davg(col("c_acctbal")).as("avg_bal"))
        .orderBy("c_mktsegment")),

    // A8 (dashboard top-narration chart): top-k groups by measure.
    "a8_topk_by_measure" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(dsum(col("value")).as("total"))
        .orderBy(desc("total"), col("event_type"))
        .limit(3)),

    // A10 (dashboard year slicer): filtered-year rollup.
    "a10_year_slice" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(yr("o_orderdate") === 1997)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy("o_orderstatus")),

    // §2.5 closing note: CUBE for the slicer's all-years totals.
    // Perf note (r8): steady-state 0.6 s at sf0.1; earlier 5.9 s readings
    // were warmup-inclusive (the cube's expand+agg plan costs ~4 s of
    // planning + codegen compile, amortized in any real deployment).
    "a12_cube_slicer" -> ((s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), yr("o_orderdate").as("order_year"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("order_year"))),

    // D1 (`spark_etl.py:62`): full-row dedup on a projection.
    "d1_dedup_full" -> ((s, d) =>
      Cleaning.dedupFull(Tables.lineitem(s, d).select("l_suppkey", "l_returnflag", "l_linestatus"))
        .orderBy("l_suppkey", "l_returnflag", "l_linestatus")),

    // D2 (`mongo_postgres_cdc.py:359-380`): last-write-wins keyed dedup.
    "d2_dedup_lww" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_type"),
          date_trunc("second", col("ts")).as("last_ts"))
        .orderBy("user_id")
    }),

    // W1 (SURVEY §2.6): ranking/analytic windows for surrogate-keying & SCD.
    "w1_window_funcs" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("rn"),
        lag("o_totalprice", 1).over(w).as("prev_price"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_total"))
        .orderBy("o_custkey", "rn")
    }),

    // W3: the rest of the SQL analytic-function surface in one window
    // pass — dense_rank / lead / ntile / percent_rank / cume_dist /
    // first_value / nth_value (w1 carries row_number, lag and the
    // running frame). All seven share ONE (custkey) partitioning, so
    // the plan pays a single window exchange; the order key
    // (o_orderdate, o_orderkey) is unique per partition, making every
    // rank/tile/navigation value deterministic, and the only doubles
    // are pass-throughs or exact-integer ratios (percent_rank,
    // cume_dist) — one IEEE division of identical integers per row.
    "w3_analytic_suite" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        dense_rank().over(w).as("drnk"),
        lead("o_totalprice", 1).over(w).as("next_price"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cdist"),
        first_value(col("o_totalprice")).over(wf).as("first_price"),
        nth_value(col("o_totalprice"), 2).over(wf).as("second_price"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // F1-F5 (`spark_etl.py:29-72`): numeric cleaning chain in one projection.
    "f_numeric_clean" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        Cleaning.leadingInt(col("o_orderpriority")).as("priority_num"),
        Cleaning.numericFill(col("o_totalprice")).as("total_filled"),
        Cleaning.toPositive(col("o_totalprice") - lit(100000.0)).as("delta_abs"))
        .orderBy("o_orderkey")),

    // F5/F6 (`spark_etl.py:59,78`): sentinel→NULL then NULL→default.
    "f_sentinel_fill" -> ((s, d) =>
      Cleaning.fillDefault(
        Cleaning.sentinelToNull(Tables.documents(s, d), "src0", Seq("source")),
        "source", "unknown")
        .select(col("doc_id"), col("source").as("src_clean"))
        .orderBy("doc_id")),

    // F7-F12 (`DB.sql:54-102`): the full date dimension.
    "f_date_dim" -> ((s, d) =>
      DateDim.fromColumn(Tables.orders(s, d), "o_orderdate").orderBy("date_id")),

    // F21 (`spark_etl.py:141`, replay-safe per SURVEY §7.4): dense surrogate
    // keys via the two-phase scale-safe global rank (bucketed prefix sum,
    // never an un-partitioned window — ScalableRank) + warehouse max-offset.
    "f21_surrogate_keys" -> ((s, d) => {
      val hwmOffset = 1000L
      graft.util.ScalableRank.globalRowNumber(
          Tables.customer(s, d).select("c_custkey"), "c_custkey")
        .select(col("c_custkey"), (col("row_num") + lit(hwmOffset)).as("fact_id"))
        .orderBy("c_custkey")
    }),

    // SURVEY §2.6 note: set operations (needed by CDC schema evolution
    // and replay reconciliation) — INTERSECT + EXCEPT over key sets,
    // computed as ONE scan + one groupBy(custkey) flags pass instead of
    // four scan+filter+distinct subtrees (intersect = in both years,
    // except = in 1997 only; same result, a quarter of the work).
    "p9_set_ops" -> ((s, d) => {
      val flags = Tables.orders(s, d)
        .filter(yr("o_orderdate").isin(1997, 1998))
        .groupBy(col("o_custkey").as("custkey"))
        .agg(max(when(yr("o_orderdate") === 1997, 1).otherwise(0)).as("in97"),
          max(when(yr("o_orderdate") === 1998, 1).otherwise(0)).as("in98"))
      flags.filter(col("in97") === 1)
        .select(col("custkey"),
          when(col("in98") === 1, "both").otherwise("only_1997").as("set_op"))
        .orderBy("set_op", "custkey")
    }),

    // SURVEY §2.5 closing note: ROLLUP for the slicer's subtotal rows.
    "a13_rollup" -> ((s, d) =>
      Tables.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))),

    // §3.3: the spark.sql entry point with GROUPING SETS — SQL surface
    // parity with the Dataset API.
    "a14_grouping_sets" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT o_orderstatus, year(o_orderdate) AS order_year, count(*) AS n
               FROM orders
               GROUP BY GROUPING SETS ((o_orderstatus), (year(o_orderdate)))
               ORDER BY o_orderstatus ASC NULLS FIRST, order_year ASC NULLS FIRST""")
    }),

    // SURVEY §2.4 note: left-semi join (the free counterpart of J4).
    "j5_semi_join" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000.0),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")),

    // Range join: measure → bucket-boundary table via broadcast
    // nested-loop (the small side is literal, so BNLJ is the right plan).
    "j6_range_join" -> ((s, d) => {
      import s.implicits._
      val buckets = Seq(
        (1, -1e18, 100.0), (2, 100.0, 500.0), (3, 500.0, 2000.0), (4, 2000.0, 1e18))
        .toDF("bucket_id", "lo", "hi")
      Tables.events(s, d)
        .join(broadcast(buckets), col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy("bucket_id")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .orderBy("bucket_id")
    }),

    // A3 at scale: HLL approximate distinct (the 100 TB path for
    // uniqueness checks), gated as its ACCURACY AUDIT — the x41/x55
    // pattern: the exact side is the audit's intrinsic cost, the
    // production form is approx-only (A3 carries the exact surface).
    // The HLL++ estimate itself is engine-specific, so it can't be
    // hash-compared — but it IS deterministic (register merges are max:
    // commutative, associative, partition-order-insensitive;
    // A15DeterminismSpec pins estimate invariance under repartition),
    // so the RELATIVE-ERROR VERDICT against the exact count is a
    // deterministic boolean both engines can state: the oracle asserts
    // the exact counts and TRUE; a drifting sketch flips the bit and
    // the hash gate goes red. rsd=0.02 keeps ~2.5× margin on the 5 %
    // verdict bound at every tested cardinality (2k-147k).
    "a15_approx_distinct" -> ((s, d) => {
      def within5pct(approx: org.apache.spark.sql.Column,
                     exact: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        abs(approx.cast("double") - exact.cast("double")) <=
          exact.cast("double") * 0.05
      // exact distincts on SEPARATE pre-distinct passes: two
      // countDistinct in one aggregate plan a 3× Expand of the fact
      // (the a26 lesson — measured 3.1→1.2 s at sf0.1); the HLLs are
      // ordinary aggregate buffers and stay on the plain pass
      val li = Tables.lineitem(s, d)
      val eo = li.select("l_orderkey").distinct()
        .agg(count(lit(1)).as("exact_orderkeys"))
      val ep = li.select("l_partkey").distinct()
        .agg(count(lit(1)).as("exact_partkeys"))
      eo.crossJoin(ep).crossJoin(li.agg(
          approx_count_distinct(col("l_orderkey"), 0.02).as("ao"),
          approx_count_distinct(col("l_partkey"), 0.02).as("ap"),
          count(lit(1)).as("n_rows")))
        .select(col("exact_orderkeys"), col("exact_partkeys"), col("n_rows"),
          within5pct(col("ao"), col("exact_orderkeys")).as("orderkeys_within_5pct"),
          within5pct(col("ap"), col("exact_partkeys")).as("partkeys_within_5pct"))
    }),

    // X100: ANALYZE-style column statistics — the optimizer-stats
    // collection pass (n, exact NDV, min/max, exact quartiles) for
    // every numeric fact measure. NDV/min/max/n for ALL columns ride
    // one map-combined HashAggregate; the exact quartiles go through
    // util.ExactQuantiles — the histogram-bucketed two-phase extract —
    // because Spark's built-in `percentile` collects the whole column
    // into ONE reducer buffer (measured 20.6 s for 12 cuts at sf0.1,
    // the worst query on the surface, and an OOM at 100 TB); the
    // two-phase form is 1 aggregate + one bounded-bucket window per
    // column and produces bit-identical quantile_cont values (the
    // oracle still states plain quantile_cont — the hash gate proves
    // the reformulation exact). Collects are metadata only: 1 stats
    // row + a 256-row histogram per column (the x43/x61 discipline).
    "x85_column_stats" -> ((s, d) => {
      val cols = Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")
      val li = Tables.lineitem(s, d)
      // ONE fact scan for the whole profile, and a fully LAZY plan
      // (the round-9 shape ran eagerly at build time, so the 5-branch
      // multi-distinct Expand it planned was invisible to plan audits
      // — the registered result was a LocalTableScan). stack() unrolls
      // the four measures to (column_name, value) — a 4× Expand that
      // map-combines IMMEDIATELY into the per-(column, value) count
      // table, so shuffle size is Σ NDV, not 4× rows (unlike the
      // multi-distinct Expand, which carried full rows into a 5-way
      // hash aggregate). From that metadata-sized table: ndv/min/max/n
      // per column in one tiny fold, and the exact quartiles through
      // GroupedQuantiles weighted by the counts (column_name IS the
      // group) — quantile_cont-exact with no percentile buffer and no
      // fact rescan.
      val stackExpr = cols.map(c => s"'$c', cast($c as double)").mkString(", ")
      // ONE materialization: stats + both quantile stages read vc, and
      // the concurrent subtrees otherwise re-ran the 4x stack expand +
      // count three times (JobProbe: 3 identical 5.4 MB partial stages)
      val vc = li
        .selectExpr(s"stack(${cols.size}, $stackExpr) as (column_name, __v)")
        .groupBy("column_name", "__v").agg(count(lit(1)).as("__w"))
        .localCheckpoint(true)
      val stats = vc.groupBy("column_name").agg(
        sum("__w").as("n_rows"),
        count(when(col("__v").isNotNull, 1)).as("ndv"),
        min("__v").as("min_val"), max("__v").as("max_val"))
      val qs = graft.util.GroupedQuantiles.cuts(
        vc, "column_name", "__v",
        Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75),
        coarseDiv = 1000.0, weight = Some("__w"))
        .drop("n")
      stats.join(qs, "column_name")
        .select("column_name", "n_rows", "ndv", "min_val", "max_val",
          "p25", "p50", "p75")
        .orderBy("column_name")
    }),

    // X101: time-series gap fill (calendar densification) — the
    // resampling step every per-entity daily series needs before
    // trend/forecast work: each active customer's March-1997 spend as
    // a DENSE 31-day series, missing days zero-filled, plus the
    // running cumulative over the filled series. The day spine is
    // GENERATED per entity (sequence + explode — |entities|×31 narrow
    // rows, no calendar table shuffle) and the left join back to the
    // sparse aggregate co-partitions on (custkey, day). Spend stays
    // exact decimal through the cumulative window (running sums of
    // doubles would be order-sensitive) and casts to double only at
    // output.
    "x86_gap_fill" -> ((s, d) => {
      val m0 = lit("1997-03-01").cast("date")
      val m1 = lit("1997-03-31").cast("date")
      val daily = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-03-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("o_custkey"), col("o_orderdate").cast("date").as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("spend"),
          count(lit(1)).as("n_orders"))
      val spine = daily.select("o_custkey").distinct()
        .select(col("o_custkey"), explode(sequence(m0, m1)).as("day"))
      val w = Window.partitionBy("o_custkey").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("o_custkey", "day"), "left")
        .select(col("o_custkey"), col("day"),
          coalesce(col("spend"), lit(0).cast("decimal(18,2)")).as("spend_dec"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .withColumn("cum_spend", sum(col("spend_dec")).over(w))
        .select(col("o_custkey"), col("day"),
          col("spend_dec").cast("double").as("spend"), col("n_orders"),
          col("cum_spend").cast("double").as("cum_spend"))
        .orderBy("o_custkey", "day")
    }),

    // X102: Benford first-digit audit — the fraud/synthetic-data
    // screen run over money columns: observed first-significant-digit
    // distribution vs Benford's law, everything in exact integers.
    // The digit comes from the integer part's decimal string (integer
    // → string is engine-identical; double → string is NOT), the
    // expectation is ⌊log10(1+1/d)·1e6⌋ baked as LITERALS (log10 at
    // runtime would hash-differ across libm builds), and shares are
    // floor-ppm. One scan, one 9-row aggregate.
    "x87_benford_audit" -> ((s, d) => {
      val exp = Map(1 -> 301029L, 2 -> 176091L, 3 -> 124938L, 4 -> 96910L,
        5 -> 79181L, 6 -> 66946L, 7 -> 57991L, 8 -> 51152L, 9 -> 45757L)
      val expCol = exp.foldLeft(lit(0L)) { case (acc, (dg, p)) =>
        when(col("digit") === dg, lit(p)).otherwise(acc) }
      val counts = Tables.orders(s, d)
        .filter(col("o_totalprice") >= 1.0)
        .select(substring(floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
          .cast("int").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n_obs"))
      // the 9-row total re-reads the same aggregate (j21's reuse shape)
      counts.crossJoin(broadcast(counts.agg(sum("n_obs").as("total"))))
        .withColumn("obs_ppm", expr("n_obs * 1000000 div total"))
        .withColumn("expected_ppm", expCol)
        .withColumn("delta_ppm", abs(col("obs_ppm") - col("expected_ppm")))
        .select("digit", "n_obs", "obs_ppm", "expected_ppm", "delta_ppm")
        .orderBy("digit")
    }),

    // X103: LOCF imputation (last observation carried forward) — the
    // gap-filling rule for STATE-like series where x86's zero-fill is
    // wrong (a balance persists through silent days; a spend does
    // not). Same per-entity generated day spine; the carried value is
    // `last(·, ignoreNulls)` over the dense series — the ignoreNulls
    // navigation w1/w3 don't exercise — partitioned per entity, one
    // window exchange. Days before the first observation stay NULL
    // (LOCF has nothing to carry — a lead-in default would be LOCB).
    "x88_locf_impute" -> ((s, d) => {
      val m0 = lit("1997-03-01").cast("date")
      val m1 = lit("1997-03-31").cast("date")
      val daily = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-03-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("o_custkey"), col("o_orderdate").cast("date").as("day"))
        .agg(max("o_totalprice").as("day_price"))
      val spine = daily.select("o_custkey").distinct()
        .select(col("o_custkey"), explode(sequence(m0, m1)).as("day"))
      val w = Window.partitionBy("o_custkey").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("o_custkey", "day"), "left")
        .select(col("o_custkey"), col("day"), col("day_price"),
          last(col("day_price"), ignoreNulls = true).over(w).as("locf_price"))
        .orderBy("o_custkey", "day")
    }),

    // X104: equi-width value histogram — the CBO selectivity histogram
    // beside x85's equi-depth quartiles: 32 fixed-width buckets over
    // (min, max), bucket id by the same monotonic per-row projection
    // ExactQuantiles buckets with (one IEEE sequence over identical
    // doubles — engine-portable, floor not round). One stats aggregate
    // (broadcast 1-row) + one bucketed count; bucket edges derive from
    // the same (mn, bw) pair so the oracle reproduces them exactly.
    "x89_histogram" -> ((s, d) => {
      val stats = Tables.lineitem(s, d)
        .agg(min("l_extendedprice").as("mn"), max("l_extendedprice").as("mx"))
      Tables.lineitem(s, d).crossJoin(broadcast(stats))
        .select(least(floor((col("l_extendedprice") - col("mn")) /
            (col("mx") - col("mn")) * 32).cast("long"), lit(31L)).as("bucket"),
          col("mn"), col("mx"))
        .groupBy("bucket", "mn", "mx")
        .agg(count(lit(1)).as("n_rows"))
        .select(col("bucket"),
          (col("mn") + col("bucket").cast("double") *
            ((col("mx") - col("mn")) / 32.0)).as("lo_edge"),
          (col("mn") + (col("bucket") + 1).cast("double") *
            ((col("mx") - col("mn")) / 32.0)).as("hi_edge"),
          col("n_rows"))
        .orderBy("bucket")
    }),

    // X110: winsorized mean — the robust KPI beside the 3σ (x82) and
    // Benford (x87) screens: clamp the price column to its exact
    // [p05, p95] (util.ExactQuantiles — no single-buffer percentile)
    // and take the exact-decimal mean of the clamped values, next to
    // the raw mean so the outlier influence is the visible delta. The
    // clamp bounds come back as two scalars (metadata), so the final
    // pass is one map-combined aggregate over a per-row least/greatest
    // — no second shuffle. Means are davg-style: exact decimal sums,
    // one IEEE division each.
    "x94_robust_mean" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val qs = graft.util.ExactQuantiles.values(
        li, "l_extendedprice", Seq(0.05, 0.95))
      val clamped = greatest(least(col("l_extendedprice"), lit(qs(1))), lit(qs(0)))
      li.agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("rs"),
          sum(clamped.cast("decimal(18,2)")).as("ws"),
          sum(when(col("l_extendedprice") < qs(0) ||
            col("l_extendedprice") > qs(1), 1L).otherwise(0L)).as("n_clamped"))
        .select(col("n"), col("n_clamped"),
          lit(qs(0)).as("p05"), lit(qs(1)).as("p95"),
          (col("rs").cast("double") / col("n")).as("raw_mean"),
          (col("ws").cast("double") / col("n")).as("winsorized_mean"))
    }),

    // W2: RANGE-framed window (30-day trailing spend per customer) —
    // value-based frames, unlike W1's row frames.
    "w2_window_range" -> ((s, d) => {
      val base = Tables.orders(s, d)
        .withColumn("day_num", datediff(col("o_orderdate"), lit("1990-01-01").cast("date")))
      val w = Window.partitionBy("o_custkey").orderBy("day_num").rangeBetween(-30, 0)
      base.select(
        col("o_custkey"), col("o_orderkey"), col("day_num"),
        count(lit(1)).over(w).as("n_last30"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").as("sum_last30"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // §3.1 end-to-end under the oracle gate: the full batch-ETL run
    // (watermark → extract → clean → dims → replay-safe surrogate keys →
    // partitioned append → QC) into a scratch warehouse, fact read back.
    "k6_pipeline_fact" -> ((s, d) => {
      // unique per-invocation scratch dir: bench, correctness gate and
      // tests can all run k6 concurrently without racing on one path;
      // cleaned up at JVM exit (the returned DataFrame reads it lazily,
      // so it must outlive this call).
      val whDir = java.nio.file.Files.createTempDirectory("graft_pipeline_wh_")
      val wh = whDir.toString
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        org.apache.commons.io.FileUtils.deleteQuietly(whDir.toFile): Unit))
      val report = graft.app.PipelineRunner.run(s, d, wh)
      require(report.qcPassed, s"pipeline QC gate failed: $report")
      s.read.parquet(s"$wh/loan_fact")
        .select("fact_id", "source_order_key", "customer_id", "date_id",
          "amount", "priority_num", "status", "load_year")
        .orderBy("source_order_key")
    }),

    // A16: PIVOT — status × year crosstab (the dashboard slicer as a
    // matrix). Pivot values are declared, so the plan stays one pass.
    "a16_pivot" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .pivot(yr("o_orderdate"), Seq(1996, 1997, 1998))
        .agg(count(lit(1)))
        .na.fill(0L)
        .withColumnsRenamed(Map("1996" -> "y1996", "1997" -> "y1997", "1998" -> "y1998"))
        .orderBy("o_orderstatus")),

    // A24: period-over-period report — monthly revenue with MoM and
    // YoY deltas, the standard BI comparison read. The lag is
    // JOIN-based (month m ⋈ add_months m−1 / m−12 on the bounded month
    // grain), not a window: an un-partitioned lag window is the
    // whole-surface lint's one forbidden shape, and MoM crosses year
    // boundaries so no natural partition key exists — the broadcast
    // self-join of a metadata-sized aggregate is the scale-correct
    // form. Deltas are ONE fixed-order IEEE expression over exact
    // cents (signed integer `div` floors vs truncates differently
    // across engines — the x91 kappa lesson, so no integer ppm here).
    "a24_period_over_period" -> ((s, d) => {
      val m = Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
          .as("rev_c"))
      val prev = m.select(col("month").as("pm"), col("rev_c").as("prev_c"))
      val yoy = m.select(col("month").as("ym"), col("rev_c").as("yoy_c"))
      m.join(broadcast(prev), col("month") === add_months(col("pm"), 1), "left")
        .join(broadcast(yoy), col("month") === add_months(col("ym"), 12), "left")
        .select(col("month"), col("rev_c"),
          (col("rev_c").cast("double") * 1000000.0 / col("prev_c").cast("double")
            - 1000000.0).as("mom_delta_ppm"),
          (col("rev_c").cast("double") * 1000000.0 / col("yoy_c").cast("double")
            - 1000000.0).as("yoy_delta_ppm"))
        .orderBy("month")
    }),

    // P10: tri-valued NOT IN — the SQL semantics corner every engine
    // must honor: with a NULLABLE probe key, `x NOT IN (subquery)` is
    // UNKNOWN (never true) for NULL x, and Spark must plan the
    // NULL-AWARE anti join (BroadcastHashJoin … isNullAware=true,
    // spec-pinned), not a plain LEFT ANTI — the plain form would keep
    // the NULL-key rows and silently diverge from ANSI. The probe key
    // is made nullable via NULLIF; the build side is a small distinct
    // set that broadcasts.
    "p10_not_in_nullable" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.customer(s, d)
        .withColumn("probe", expr("nullif(c_custkey % 100, 7)"))
        .createOrReplaceTempView("p10_probe")
      s.sql("""SELECT c_custkey, probe FROM p10_probe
               WHERE probe NOT IN (SELECT o_orderkey % 100 FROM orders
                                   WHERE o_orderkey % 100 < 20)
               ORDER BY c_custkey""")
    }),

    // A23: UNPIVOT — a16's inverse, the wide→long melt every metrics
    // warehouse needs (N measure columns → (metric, value) rows so one
    // query/chart template serves every metric). The Dataset unpivot
    // API plans a single Expand over one fact scan — the fact is read
    // once and emitted 4×, never scanned per metric; the per-metric
    // aggregate then runs map-combined on the long form. Sums are
    // exact-decimal (Det) since the melt mixes magnitudes.
    "a23_unpivot" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "metric", "value")
        .groupBy("l_returnflag", "metric")
        .agg(count(lit(1)).as("n"),
          graft.util.Det.dsum(col("value")).as("sum_value"))
        .orderBy("l_returnflag", "metric")),

    // J7: entity-resolution fuzzy matching — blocked levenshtein join
    // over customer names (the dim-dedup problem of the reference's
    // star schema).
    "j7_fuzzy_names" -> ((s, d) =>
      graft.dedup.FuzzyMatch.blockedNamePairs(
        Tables.customer(s, d).filter(col("c_custkey") <= 2000),
        "c_custkey", "c_name", maxDist = 1)
        .orderBy("id_a", "id_b")),

    // A18: grouped array aggregation — collect_set made deterministic by
    // sorting (collect order is partition-dependent; the sort is what
    // makes the result reproducible at any parallelism). The array is
    // projected to a pipe-joined string so the result row is hashable by
    // any harness (array cells aren't).
    "a18_group_arrays" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(array_join(sort_array(collect_set(col("o_orderpriority"))), "|").as("priorities"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")),

    // A17: exact percentile profile per group (sorted-interpolation
    // semantics match quantile_cont bit-for-bit) — the winsorization /
    // outlier-threshold primitive. Routed through GroupedQuantiles'
    // histogram refinement: the built-in `percentile` plans
    // ObjectHashAggregate(partial_percentile), whose final merge holds
    // each group's ENTIRE value set in one task buffer — the x85
    // single-funnel shape, an OOM at 100 TB. The oracle still states
    // plain quantile_cont, so the hash gate proves the refinement
    // exact (plan shape pinned by GroupedQuantilesSpec).
    "a17_percentiles" -> ((s, d) =>
      graft.util.GroupedQuantiles.cuts(
        Tables.orders(s, d), "o_orderstatus", "o_totalprice",
        Seq("p50" -> 0.5, "p95" -> 0.95, "p99" -> 0.99), coarseDiv = 1000.0)
        .orderBy("o_orderstatus")),

    // J8: as-of join — each event picks up the customer's latest order
    // on or before the event date (point-in-time lookup, composed as a
    // union + running last-value window: no range-join explosion).
    "j8_asof_join" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"), col("o_orderdate").cast("date"))
        .orderBy(desc("o_orderkey"))
      val latestPerDay = Tables.orders(s, d)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("o_custkey").as("user_id"),
          col("o_orderdate").cast("date").as("odate"),
          col("o_orderkey"), col("o_totalprice"))
      val evts = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts").cast("date").as("event_date"))
      graft.operators.AsofJoin.asofLeft(
        evts, latestPerDay, "user_id", "event_date", "odate",
        Seq("o_orderkey", "o_totalprice"))
        .orderBy("event_id")
    }),

    // J9 (TPC-H Q3 shape): shipping-priority — selective filters on all
    // THREE join inputs (segment on the broadcast dim, date bands on
    // both fact scans — every one reaches the parquet scan as a pushed
    // filter), per-order revenue, top-10 by revenue. The classic
    // filter-pushdown + BHJ + TakeOrderedAndProject optimizer exercise:
    // at 100 TB the date bands are partition-prunable and the top-k
    // never materializes the full aggregate sort.
    "j9_shipping_priority" -> ((s, d) => {
      val cutoff = lit("1998-06-01").cast("timestamp")
      Tables.lineitem(s, d).filter(col("l_shipdate") > cutoff)
        .join(Tables.orders(s, d).filter(col("o_orderdate") < cutoff),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(dsumExpr(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(desc("revenue"), col("l_orderkey"))
        .limit(10)
    }),

    // J10 (TPC-H Q5 shape): local-supplier volume — the 6-way join with
    // the DUAL equi-condition (supplier in the CUSTOMER's nation:
    // l_suppkey = s_suppkey AND c_nationkey = s_nationkey), revenue per
    // nation of one region in one year. The multi-way join-order
    // exercise: region/nation/supplier broadcast, the customer⋈orders⋈
    // lineitem chain shuffles on its keys, and the nation equality rides
    // the supplier join as a second condition instead of a post-filter.
    "j10_local_supplier_volume" -> ((s, d) => {
      val nations = broadcast(Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey")))
      // year as a RANGE predicate, not EXTRACT(year)=1997: a function
      // over the column cannot push to the parquet scan; the range
      // reaches PushedFilters (and partition-prunes a date-partitioned
      // layout at scale)
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
                  col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(nations, col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsumExpr(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(desc("revenue"), col("n_name"))
    }),

    // A21: ordered event funnel (view → click → purchase) — per-user
    // stage progress via ONE user-keyed shuffle: a running
    // "furthest-stage-reached" window flag per row, so a later stage
    // counts only when an earlier-stage row precedes it in event time.
    // The naive per-stage min-ts formulation self-joins events once PER
    // STAGE (three user-keyed shuffles of the fact); this plan pays one.
    // User partitions are events-per-user sized — never corpus-sized —
    // and the final stage counts collapse map-side to a single row.
    "a21_event_funnel" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val staged = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
        .withColumn("seen_view",
          max(when(col("event_type") === "view", 1).otherwise(0)).over(w))
        .withColumn("click_ok",
          when(col("event_type") === "click" && col("seen_view") === 1, 1).otherwise(0))
        .withColumn("seen_click", max(col("click_ok")).over(w))
        .withColumn("purchase_ok",
          when(col("event_type") === "purchase" && col("seen_click") === 1, 1).otherwise(0))
      staged.groupBy("user_id").agg(
          max(when(col("event_type") === "view", 1).otherwise(0)).as("u_view"),
          max(col("click_ok")).as("u_click"),
          max(col("purchase_ok")).as("u_purchase"))
        .agg(sum("u_view").as("n_view"),
          sum("u_click").as("n_click_after_view"),
          sum("u_purchase").as("n_purchase_after_click"))
    }),

    // X106: TIME-BOUNDED conversion — a21's ordered funnel with the
    // constraint real attribution adds: the purchase must land within
    // one hour of a PRECEDING view (the MATCH_RECOGNIZE-style
    // pattern-with-deadline). Same one-user-keyed-window discipline —
    // the running max carries the latest view TIMESTAMP (not a flag),
    // and the deadline is pure interval arithmetic (ts ≤ last_view +
    // 1h, exact micros on both engines — no epoch-seconds truncation
    // games). No per-stage self-join: one fact shuffle, map-combined
    // final counts.
    "x90_timed_conversion" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
        .withColumn("last_view_ts",
          max(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("conv",
          when(col("event_type") === "purchase" && col("last_view_ts").isNotNull &&
            col("ts") <= col("last_view_ts") + expr("INTERVAL 1 HOUR"), 1)
            .otherwise(0))
        .agg(count(lit(1)).as("n_events"),
          sum("conv").as("n_conversions"),
          countDistinct(when(col("conv") === 1, col("user_id")))
            .as("n_converting_users"))
    }),

    // X108: per-customer spend trend — the churn/decline screen: least-
    // squares slope of monthly 1997 spend per customer, a19's
    // determinism discipline applied per entity. Months collapse to
    // exact integer cents first (one fact shuffle), the per-customer
    // sums (n, Σx, Σy, Σxy, Σx²) are exact longs over ≤12 points, and
    // the slope is ONE IEEE division of two exact integers — no
    // regression-library float accumulation anywhere. Customers with a
    // single active month drop (slope undefined); the decliner flag is
    // a deterministic sign test.
    "x92_spend_trend" -> ((s, d) => {
      val m = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy(col("o_custkey"), (month(col("o_orderdate")) - 1).cast("long").as("x"))
        .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")).as("y"))
      m.groupBy("o_custkey").agg(
          count(lit(1)).as("n_months"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
        .filter(col("n_months") >= 2)
        .select(col("o_custkey"), col("n_months"),
          ((col("n_months") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n_months") * col("sxx") - col("sx") * col("sx")).cast("double"))
            .as("slope_cents"))
        .withColumn("declining", (col("slope_cents") < 0.0).cast("int"))
        .orderBy("o_custkey")
    }),

    // X109: event-lateness profile — the measurement that SIZES a
    // watermark (SURVEY §2.8 T3/T4's delay is otherwise a guess): how
    // far events arrive behind the running per-key event-time
    // high-water mark, in seconds, bucketed log2 (the q_skew_profile
    // read: integer binary-string length, no log()), so "a watermark
    // of 2^k seconds captures all but the top buckets' rows" reads
    // straight off the histogram. The generated events are written in
    // perfect time order, so the ARRIVAL sequence is the x78/x79-style
    // deterministic plant: a replay through the md5-shuffled ingestion
    // order (util.Sampling.shuffleKey — the oracle re-derives the same
    // permutation, so the hash gate verifies the lateness computation,
    // not the synthesis). One user-partitioned window exchange + a
    // bounded aggregate; seconds floor on EACH side (not of the
    // difference) — the one form both engines compute identically.
    "x93_lateness_profile" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(graft.util.Sampling.shuffleKey(col("event_id")))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"))
        .withColumn("hwm", max("ts").over(w))
        .select((unix_timestamp(col("hwm")) - unix_timestamp(col("ts")))
          .as("late_sec"))
        .select(
          when(col("late_sec") <= 0, lit(-1))
            .otherwise(length(bin(col("late_sec"))) - 1).as("log2_bucket"))
        .groupBy("log2_bucket")
        .agg(count(lit(1)).as("n_events"))
        .orderBy("log2_bucket")
    }),

    // X111: time-to-convert distribution — the latency histogram behind
    // x90's conversion verdict: for every qualifying purchase (within
    // 1 h of the latest preceding view), seconds from that view,
    // collapsed to log2 buckets (x93's integer read). The product
    // question "do converts happen in seconds or minutes" reads off
    // the histogram; same single user-keyed window, bounded aggregate.
    "x95_convert_latency" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
        .withColumn("last_view_ts",
          max(when(col("event_type") === "view", col("ts"))).over(w))
        .filter(col("event_type") === "purchase" && col("last_view_ts").isNotNull &&
          col("ts") <= col("last_view_ts") + expr("INTERVAL 1 HOUR"))
        .select((unix_timestamp(col("ts")) - unix_timestamp(col("last_view_ts")))
          .as("lat_sec"))
        .select(when(col("lat_sec") <= 0, lit(-1))
          .otherwise(length(bin(col("lat_sec"))) - 1).as("log2_bucket"))
        .groupBy("log2_bucket")
        .agg(count(lit(1)).as("n_conversions"))
        .orderBy("log2_bucket")
    }),

    // X114: batch sessionization — the gap rule (new session when >30
    // min since the user's previous event) computed as the classic
    // lag + running-sum pair over ONE user-keyed window exchange; the
    // streaming twin is t3's session window, this is the backfill/
    // reprocessing shape every events warehouse runs nightly. The gap
    // test is pure interval arithmetic on exact micros (no
    // epoch-seconds truncation), sessions collapse to a per-session
    // event count, and the surfaced result is the bounded
    // events-per-session histogram — the engagement distribution a
    // product team reads. All three windows/aggregates share the
    // user_id partitioning, so Catalyst plans ONE exchange for the
    // fact; the histogram aggregate is map-side combined over at most
    // max-session-length rows.
    "x98_sessionize" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"))
        .withColumn("prev_ts", lag("ts", 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1L)
            .otherwise(0L))
        .withColumn("sess_id", sum("new_sess").over(run))
        .groupBy("user_id", "sess_id")
        .agg(count(lit(1)).as("events_per_session"))
        .groupBy("events_per_session")
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy("events_per_session")
    }),

    // X211: session-gap sensitivity curve — x98 sessionizes at ONE
    // stated gap (30 min); this is the read that JUSTIFIES the number:
    // for each candidate gap g, the session count and mean session
    // size that rule would produce, all from one pass over the
    // inter-event gap distribution (n_sessions(g) = first-events +
    // |gaps > g| — a session boundary IS a gap exceeding g, so no
    // re-sessionization per candidate). The t3/X25 state-sizing
    // companion: TTL and gap parameters get picked off this curve, not
    // guessed. Scale: ONE user-keyed lag window (the x98 exchange),
    // then a bounded 5× explode of the gap rows feeding one
    // map-combined aggregate; output is the 5-row curve. Mean session
    // size in exact ppm (integer division — hash-stable).
    "x186_session_gaps" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val gaps = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"))
        .withColumn("prev_ts", lag("ts", 1).over(w))
        .select(
          // events ts is TIMESTAMP_NTZ; cast to TIMESTAMP under the
          // session's UTC zone so unix_micros applies (pure differences
          // are zone-invariant anyway)
          (unix_micros(col("ts").cast("timestamp"))
            - unix_micros(col("prev_ts").cast("timestamp"))).as("gap_us"))
      gaps
        .select(explode(array(lit(5L), lit(15L), lit(30L), lit(60L), lit(120L)))
          .as("gap_min"), col("gap_us"))
        .groupBy("gap_min")
        .agg(
          sum(when(col("gap_us").isNull
              || col("gap_us") > col("gap_min") * lit(60000000L), 1L)
            .otherwise(0L)).as("n_sessions"),
          count(lit(1)).as("n_events"))
        .withColumn("events_per_session_ppm",
          expr("n_events * 1000000 div n_sessions"))
        .orderBy("gap_min")
    }),

    // X115: event-type transition matrix — P(next type | type) from
    // per-user ordered event streams: lead() over the SAME user-keyed
    // window discipline as x90/x95 (ts, event_id total order), pair
    // counts in one map-combined aggregate, and the row-normalizing
    // total via a window over the BOUNDED |types|² matrix (never a
    // second fact pass). Probabilities are exact integer ppm
    // (count·1e6 // row_total) so the hash gate covers the division.
    // The Markov-chain read of product flows: which step follows
    // which, and how often.
    "x99_transition_matrix" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
        .withColumn("next_type", lead("event_type", 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n_pairs"))
      val rowTotal = Window.partitionBy("from_type")
      pairs
        .withColumn("row_total", sum("n_pairs").over(rowTotal))
        .withColumn("p_ppm", expr("n_pairs * 1000000 div row_total"))
        .drop("row_total")
        .orderBy("from_type", "to_type")
    }),

    // X116: rolling-window anomaly days — per event type, flag days
    // whose count leaves the PRIOR week's 3σ band. The baseline window
    // is the 7 preceding days EXCLUDING the day under test — include
    // it and a spike dilutes the very variance it is judged against
    // (the planted-spike spec fails on the inclusive form: a 10× day
    // inside its own 7-window computes z ≈ 2.4 and passes). The z-test
    // runs ENTIRELY in integer arithmetic: with baseline n, sum S, sum
    // of squares Q, |x−μ| > 3σ ⇔ (n·x−S)² > 9·(n·Q−S²) after
    // multiplying through by n² — so the verdict bit is hash-exact on
    // both engines with no stddev float anywhere (same move as x92's
    // slope and j23's ppm). The fact collapses to the bounded
    // (type, day) grain in its only shuffle; the rolling window runs
    // over that metadata-sized table partitioned by type. Only days
    // with a full 7-day baseline judge (rn ≥ 8) — the warm-up edge is
    // not a verdict.
    // X202: seasonal-baseline anomaly profile — x100's rolling window
    // catches TREND breaks but flags every Friday peak as anomalous;
    // the operations-monitoring complement is a SEASONAL baseline:
    // per (day-of-week × hour) cell, the exact median event value and
    // the MAD around it (both via GroupedQuantiles — histogram
    // refinement, no cell-sized percentile buffers), and the robust
    // verdict count |v − med| > 3·MAD per cell. Values quantized to
    // exact milli longs, so every double downstream (.5-grain medians,
    // residuals) is exactly representable and the 3·MAD comparison is
    // deterministic in any engine. The 168-cell baseline table is the
    // broadcast metadata a live monitor ships; at 100 TB both medians
    // run over the (cell, value)-histogram, never the event rows.
    "x177_seasonal_anomaly" -> ((s, d) => {
      import graft.util.GroupedQuantiles
      val ev = Tables.events(s, d)
        .withColumn("vm", (col("value").cast("decimal(18,3)") * 1000).cast("long"))
        .withColumn("dow", dayofweek(col("ts")))
        .withColumn("hour", hour(col("ts")))
        .withColumn("cell", col("dow") * 100 + col("hour"))
      val med = GroupedQuantiles.cuts(ev, "cell", "vm", Seq(("med", 0.5)))
        .select(col("cell"), col("med"))
      val withRes = ev.join(broadcast(med), Seq("cell"))
        .withColumn("resid", abs(col("vm").cast("double") - col("med")))
      val mad = GroupedQuantiles.cuts(withRes, "cell", "resid", Seq(("mad", 0.5)))
        .select(col("cell"), col("mad"))
      withRes.join(broadcast(mad), Seq("cell"))
        .groupBy("dow", "hour")
        .agg(count(lit(1)).as("n"),
          max("med").as("baseline_med_milli"),
          max("mad").as("mad_milli"),
          sum(when(col("resid") > col("mad") * 3.0, 1L).otherwise(0L))
            .as("n_anomalies"))
        .orderBy("dow", "hour")
    }),

    "x100_rolling_anomaly" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val trail = w.rowsBetween(-7, -1)
      daily
        .withColumn("rn", row_number().over(w))
        .withColumn("wn", count(lit(1)).over(trail))
        .withColumn("ws", sum("n_events").over(trail))
        .withColumn("wq", sum(col("n_events") * col("n_events")).over(trail))
        .filter(col("rn") >= 8)
        .select(col("event_type"), col("day"), col("n_events"),
          col("ws").as("win_sum"),
          ((col("wn") * col("n_events") - col("ws")) *
            (col("wn") * col("n_events") - col("ws")) >
            (col("wn") * col("wq") - col("ws") * col("ws")) * 9L)
            .cast("int").as("anomaly"))
        .orderBy("event_type", "day")
    }),

    // X118: time-weighted average (TWAP) — the aggregate for irregular
    // time series where a plain mean over-weights busy periods: each
    // observation holds from its event until the user's next one, so
    // the weight is the exact interval in MICROSECONDS (unix_micros
    // longs — no seconds truncation, no float time math) and the last
    // observation carries none. Values collapse to exact integer cents
    // first; the weighted sum runs in decimal(38,0) (per-row products
    // ~1e15 fit a long, corpus sums don't), and the average is ONE
    // IEEE division of two exact integers at the very end — the
    // finance/sensor read (x92's discipline on a weighted mean). One
    // user-keyed window exchange; the aggregate reuses the same
    // partitioning, so the fact shuffles once.
    "x102_twap" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        .withColumn("vc", round(col("value") * 100).cast("long"))
        // events.ts loads as NTZ; the session is pinned UTC so the
        // cast is the identity relabeling unix_micros needs
        .withColumn("us", unix_micros(col("ts").cast("timestamp")))
        .withColumn("next_us", lead(col("us"), 1).over(w))
        .filter(col("next_us").isNotNull)
        .withColumn("dt_us", col("next_us") - col("us"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_intervals"),
          sum((col("vc") * col("dt_us")).cast("decimal(38,0)")).as("wsum"),
          sum("dt_us").as("tsum"))
        .select(col("user_id"), col("n_intervals"),
          (col("wsum").cast("double") / col("tsum").cast("double"))
            .as("twap_cents"))
        .orderBy("user_id")
    }),

    // X119: A/B experiment analysis — deterministic md5 arm assignment
    // (no RNG state: the same user lands in the same arm on every
    // engine and every run), per-arm conversion in exact integer ppm,
    // and the 2×2 chi-square statistic computed from the four EXACT
    // cell counts with a fixed IEEE op order (counts < 2^53 cast to
    // double, left-associated products, one division) — both engines
    // produce the bit-identical statistic, so even the significance
    // test sits under the hash gate. The outcome is x90's TIMED
    // conversion (purchase ≤1 h after the latest preceding view) —
    // any-purchase is degenerate on this data (every user converts
    // eventually, zeroing a chi-square margin); composing the
    // attribution definition is also what a real experiment reads.
    // One user-keyed window pass collapses the fact to user grain;
    // everything after is a four-cell aggregate.
    "x103_ab_lift" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
        .withColumn("last_view_ts",
          max(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("conv",
          when(col("event_type") === "purchase" && col("last_view_ts").isNotNull &&
            col("ts") <= col("last_view_ts") + expr("INTERVAL 1 HOUR"), 1L)
            .otherwise(0L))
        .groupBy("user_id")
        .agg(max(col("conv")).as("converted"))
        .withColumn("arm",
          pmod(graft.util.Sampling.hashBucket(col("user_id")), lit(2)))
        .agg(
          sum(when(col("arm") === 0 && col("converted") === 1, 1L).otherwise(0L)).as("a_conv"),
          sum(when(col("arm") === 0 && col("converted") === 0, 1L).otherwise(0L)).as("a_no"),
          sum(when(col("arm") === 1 && col("converted") === 1, 1L).otherwise(0L)).as("b_conv"),
          sum(when(col("arm") === 1 && col("converted") === 0, 1L).otherwise(0L)).as("b_no"))
        .withColumn("a_ppm", expr("a_conv * 1000000 div (a_conv + a_no)"))
        .withColumn("b_ppm", expr("b_conv * 1000000 div (b_conv + b_no)"))
        .withColumn("lift_ppm", col("b_ppm") - col("a_ppm"))
        .withColumn("chi2", expr(
          """CAST(a_conv + a_no + b_conv + b_no AS DOUBLE)
             * CAST(a_conv * b_no - a_no * b_conv AS DOUBLE)
             * CAST(a_conv * b_no - a_no * b_conv AS DOUBLE)
             / (CAST(a_conv + a_no AS DOUBLE) * CAST(b_conv + b_no AS DOUBLE)
                * CAST(a_conv + b_conv AS DOUBLE) * CAST(a_no + b_no AS DOUBLE))"""))
    }),

    // X120: OHLC bar downsampling — irregular ticks → fixed 15-minute
    // bars per event type (the candlestick/metrics-rollup shape every
    // time-series store needs): open/close are the FIRST/LAST value in
    // the bar under the (ts, event_id) total order, high/low plain
    // min/max, all in exact integer cents. First/last ride min_by/
    // max_by on a zero-padded "micros‖event_id" string key — the one
    // order-key encoding whose lexicographic comparison both engines
    // define identically (struct-ordered arg_min exists in neither
    // engine's SQL the same way) — so the whole bar is ONE map-side-
    // combined aggregate: no window, no second shuffle, and at 100 TB
    // each task combines its local bars before the (type, bar)
    // exchange ever sees a row.
    "x104_ohlc_bars" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("vc", round(col("value") * 100).cast("long"))
        .withColumn("us", unix_micros(col("ts").cast("timestamp")))
        .withColumn("bar", expr("us div 900000000"))
        .withColumn("okey",
          concat(lpad(col("us").cast("string"), 20, "0"),
            lpad(col("event_id").cast("string"), 12, "0")))
        .groupBy(col("event_type"), col("bar"))
        .agg(
          min_by(col("vc"), col("okey")).as("open_c"),
          max(col("vc")).as("high_c"),
          min(col("vc")).as("low_c"),
          max_by(col("vc"), col("okey")).as("close_c"),
          count(lit(1)).as("n_ticks"))
        .withColumn("bar_start", timestamp_micros(col("bar") * 900000000L))
        .select("event_type", "bar_start", "open_c", "high_c", "low_c",
          "close_c", "n_ticks")
        .orderBy("event_type", "bar_start")),

    // X121: CUSUM level-shift detection — the complement of x116's
    // spike test: a SUSTAINED +30% step never leaves a single day's 3σ
    // band but accumulates here. The one-sided CUSUM recursion
    // S_i = max(0, S_{i-1} + x_i − k) is not a window sum — but it has
    // the closed form S_i = cum_i − min_{j≤i} cum_j over the cumulative
    // deviations, so it computes as TWO stacked windows on the bounded
    // (type, day) grain with exact integers end-to-end (allowance k =
    // the type's global mean, floored; flag when the accumulated drift
    // exceeds two mean-days). The fact pays one map-combined collapse
    // to the daily grain; everything after is metadata-sized.
    "x105_cusum_shift" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"))
      val byType = Window.partitionBy("event_type")
      val ordered = byType.orderBy("day")
      val run = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .withColumn("tot", sum("n_events").over(byType))
        .withColumn("nd", count(lit(1)).over(byType))
        .withColumn("k", expr("tot div nd"))
        .withColumn("cum", sum(col("n_events") - col("k")).over(run))
        .withColumn("cusum", col("cum") - min("cum").over(run))
        .select(col("event_type"), col("day"), col("n_events"),
          col("cusum"), (col("cusum") > col("k") * 2).cast("int").as("shifted"))
        .orderBy("event_type", "day")
    }),

    // X122: market-basket pair support — the co-purchase read: part
    // pairs appearing in the same order, top-20 by support. The pair
    // explosion is the ORDER-grain self-join, bounded by per-order
    // fanout² (TPC-H orders carry ≤7 lines — Σ C(f,2) is linear in the
    // fact, NOT quadratic in parts; q_join_explosion is the standing
    // guard for that distinction), deduped to the (order, part) grain
    // first so quantity re-lines don't inflate support. Pair counts
    // map-combine; the top-20 is a TakeOrderedAndProject, never a full
    // sort.
    "x106_basket_pairs" -> ((s, d) => {
      val op = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      op.join(op.select(col("l_orderkey").as("o2"), col("l_partkey").as("p2")),
          col("l_orderkey") === col("o2") && col("l_partkey") < col("p2"))
        .groupBy(col("l_partkey").as("part_a"), col("p2").as("part_b"))
        .agg(count(lit(1)).as("support"))
        .orderBy(desc("support"), col("part_a"), col("part_b"))
        .limit(20)
    }),

    // X225: label-propagation communities over the co-purchase graph
    // (Raghavan et al.) — x106 builds the edges (part pairs bought
    // together, support ≥ 2 so noise singleton-pairs drop), x43/x165's
    // CC answers reachability; THIS answers density: three synchronous
    // LPA sweeps with the deterministic (count desc, min label)
    // tie-break, every node updating from the previous round's labels,
    // so the assignment is a pure function of the edge set — the
    // DuckDB oracle unrolls the identical three rounds. Per round: one
    // edge⋈label join, one map-combined (node, label) count, one
    // node-partitioned top-1 window — O(rounds·|E|), no global
    // structure, labels localCheckpoint'd per round (the CC lineage
    // discipline). The support threshold is the density knob that
    // keeps |E| ≲ |fact| at 100 TB (Σ per-order C(f,2) is
    // fanout-bounded, the x106 guarantee); the sweep count is fixed
    // and small, the production norm for LPA.
    "x200_lpa_communities" -> ((s, d) => {
      val op = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val edges = op.join(
          op.select(col("l_orderkey").as("o2"), col("l_partkey").as("p2")),
          col("l_orderkey") === col("o2") && col("l_partkey") < col("p2"))
        .groupBy(col("l_partkey").as("src"), col("p2").as("dst"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
        .select("src", "dst")
      graft.operators.LabelPropagation.run(edges, 3)
        .orderBy("node")
    }),

    // X123: audience-overlap matrix — |users who did type A AND type B|
    // for every type pair, the set-intersection read behind audience
    // sizing. Instead of 25 distinct-count self-joins, each user
    // collapses to ONE bitmask (bit_or of 1<<type index) in the single
    // fact shuffle; the mask HISTOGRAM (≤2⁵ rows of metadata) then
    // answers every pairwise intersection by summing masks containing
    // both bits against a literal pair grid — the roaring-bitmap idea
    // in its bounded form, exact integers throughout.
    "x107_audience_overlap" -> ((s, d) => {
      import s.implicits._
      val idx = "CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1" +
        " WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 ELSE 4 END"
      val masks = Tables.events(s, d)
        .select(col("user_id"),
          expr(s"shiftleft(cast(1 as bigint), $idx)").as("bit"))
        .groupBy("user_id").agg(expr("bit_or(bit)").as("mask"))
        .groupBy("mask").agg(count(lit(1)).as("n_users"))
      val types = Seq("view", "click", "purchase", "signup", "error").zipWithIndex
      val grid = types.flatMap { case (a, i) => types.collect {
        case (b, j) if i <= j => (a, i, b, j) } }
        .toDF("type_a", "bit_a", "type_b", "bit_b")
      masks.crossJoin(broadcast(grid))
        .filter(expr("(shiftright(mask, bit_a) & 1) = 1" +
          " and (shiftright(mask, bit_b) & 1) = 1"))
        .groupBy("type_a", "type_b")
        .agg(sum("n_users").as("n_users"))
        .orderBy("type_a", "type_b")
    }),

    // X124: DAU/WAU/stickiness — the engagement KPI with the sliding
    // COUNT(DISTINCT) trap: WAU per day is a 7-day sliding distinct,
    // and the naive per-day self-join rescans the fact 7× (or a
    // distinct-over-RANGE-window, which Spark refuses outright). The
    // scalable exact form: collapse to the (user, day) grain once,
    // EXPLODE each row onto the 7 days it covers (bounded 7× of the
    // small grain, not the fact), re-distinct, count. Stickiness is
    // exact integer ppm. At 100 TB the fact is touched once; every
    // later stage is users×days-sized.
    "x108_active_users" -> ((s, d) => {
      val ud = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
      val wau = ud
        .select(col("user_id"),
          explode(sequence(lit(0), lit(6))).as("i"), col("day"))
        .select(col("user_id"), date_add(col("day"), col("i")).as("day"))
        .distinct()
        .groupBy("day").agg(count(lit(1)).as("wau"))
      dau.join(wau, "day")
        .withColumn("stickiness_ppm", expr("dau * 1000000 div wau"))
        .orderBy("day")
    }),

    // X125: top user journeys — the path-analysis read one step past
    // x99's single transitions: each user's FIRST five events as an
    // ordered "a>b>c>d>e" path, counted across users (which openings
    // dominate, where journeys fork). The rank-and-cut rides the same
    // user-keyed window as x90/x98; the path assembles from
    // sort_array(struct(rn, type)) — collect_list alone has no order
    // guarantee, the struct sort pins it — and only complete 5-step
    // journeys aggregate, so the path table is bounded by |types|⁵
    // regardless of corpus size. Top-20 is a TakeOrdered.
    "x109_top_paths" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_ev"),
          array_join(expr("transform(sort_array(collect_list(struct(rn, event_type))), x -> x.event_type)"), ">").as("path"))
        .filter(col("n_ev") === 5)
        .groupBy("path").agg(count(lit(1)).as("n_users"))
        .orderBy(desc("n_users"), col("path"))
        .limit(20)
    }),

    // A22: cohort retention — users bucketed by first-seen week, counted
    // per (cohort, week-offset) of later activity. ONE events scan:
    // week truncation is monotone, so the cohort week IS min(activity
    // week) — derived from the (user, week) distinct table itself via a
    // per-user window instead of a second first-seen scan of the fact
    // (the q_fk lesson: never pay the big scan twice). The fact pays
    // exactly one map-side-combined (user, week) distinct shuffle;
    // everything after — the user-keyed window exchange and the
    // (cohort, offset) count — runs over the users×weeks-sized distinct
    // table, never the fact. Week offsets use explicit integer division
    // (`div`) of the int datediff — both weeks are Monday-truncated so
    // the diff is always a non-negative multiple of 7 and the division
    // is exact by construction, with no IEEE double step anywhere.
    "a22_cohort_retention" -> ((s, d) => {
      val act = Tables.events(s, d)
        .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("activity_week"))
        .distinct()
      act
        .withColumn("cohort_week",
          min("activity_week").over(Window.partitionBy("user_id")))
        .select(col("cohort_week"),
          expr("datediff(activity_week, cohort_week) div 7").cast("int").as("week_offset"))
        .groupBy("cohort_week", "week_offset").agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_week", "week_offset")
    }),

    // J11 (TPC-H Q18 shape): large-volume customers — HAVING over a
    // map-side-combined aggregate of the BIGGEST table feeds the join.
    // The aggregate shrinks lineitem to qualifying order keys before
    // any join touches orders/customer; the inverted shape (join first,
    // filter after) would shuffle the full lineitem⋈orders product just
    // to discard it. The qualifying set is ~1.5% of orders at this
    // threshold and grows LINEARLY with data, so it gets no broadcast
    // hint: AQE sees its runtime size and picks BHJ while it fits the
    // broadcast threshold (it does at sf0.1), falling back to SMJ at a
    // scale where a forced broadcast would OOM the driver.
    "j11_big_customer" -> ((s, d) => {
      val qualifying = Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(dsum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 250.0)
      Tables.orders(s, d)
        .join(qualifying, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(100)
    }),

    // J12 (TPC-H Q17 shape): small-quantity-order revenue — the classic
    // correlated scalar subquery (qty < 0.2 × per-part avg),
    // decorrelated into a per-key WINDOW over one shuffle: the same
    // l_partkey exchange serves the aggregate and the probe, so the
    // brand-filtered fact is scanned ONCE (the aggregate-then-join form
    // pays the scan twice). Per-part partitions are lines-per-part
    // sized (~30 at any scale — partkey cardinality grows with data),
    // so the window never funnels. The avg comparison is float-free:
    // 5·qty·cnt < Σqty in integer cents ≡ qty < 0.2·avg, exact on both
    // engines (0.2·avg would be an IEEE divide).
    "j12_small_qty_revenue" -> ((s, d) => {
      val qc = round(col("l_quantity") * 100).cast("long")
      val w = Window.partitionBy("l_partkey")
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .filter(col("p_brand") === "Brand#23").select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_extendedprice"), qc.as("qc"),
          sum(qc).over(w).as("sqc"), count(lit(1)).over(w).as("cnt"))
        .filter(lit(5L) * col("qc") * col("cnt") < col("sqc"))
        .agg(dsum(col("l_extendedprice")).as("small_qty_revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // J13 (TPC-H Q4 shape): order-priority checking — the correlated
    // EXISTS decorrelated to a LEFT SEMI join whose condition carries
    // the non-equi correlated term (l_shipdate > o_orderdate + 60 days
    // rides the orderkey equi-join as a residual, never a post-join
    // filter over a full product; the semi join emits each order at
    // most once, so no DISTINCT pass). The order-date window is a
    // pushed range scan filter. (This schema carries no commitdate/
    // receiptdate; late-vs-order-date is the same correlated-exists
    // topology as the original commit-vs-receipt predicate.)
    "j13_priority_check" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
                col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
      o.join(Tables.lineitem(s, d),
          col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // J14 (TPC-H Q21 shape): suppliers who kept orders waiting — the
    // suite's hardest decorrelation, three correlated references to the
    // SAME fact: the probe (this supplier shipped late on a finished
    // order), an EXISTS proving another supplier participated (LEFT
    // SEMI), and a NOT EXISTS proving no other supplier was also late
    // (LEFT ANTI) — each on the orderkey equi-join with the
    // supplier-inequality (and lateness, for the anti side) as residual
    // conditions. All three legs shuffle on the same orderkey, so AQE
    // reuses one exchange of the fact; the supplier dim joins broadcast
    // AFTER the facts shrink to late-line grain. numwait counts late
    // LINES per supplier (the Q21 convention: each l1 row is one wait).
    "j14_waiting_supplier" -> ((s, d) => {
      val lateDays = expr("INTERVAL 60 DAYS")
      val l1 = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + lateDays)
        .select(col("l_orderkey").as("okey"), col("l_suppkey").as("skey"),
          col("o_orderdate").as("odate"))
      val l2 = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
      val l3 = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"),
          col("l_shipdate").as("ship3"))
      l1
        .join(l2, col("o2") === col("okey") && col("s2") =!= col("skey"), "left_semi")
        .join(l3, col("o3") === col("okey") && col("s3") =!= col("skey") &&
          col("ship3") > col("odate") + lateDays, "left_anti")
        .join(broadcast(Tables.supplier(s, d)), col("skey") === col("s_suppkey"))
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
        .orderBy(desc("numwait"), col("s_name"))
        .limit(20)
    }),

    // J15 (TPC-H Q22 shape): sales opportunity — the scalar aggregate
    // subquery (above-average balance) plus NOT EXISTS (no RECENT
    // order; this corpus has essentially no order-less customers, so
    // the dormancy cutoff keeps the anti-join selective while
    // preserving Q22's exact topology), decorrelated to a broadcast
    // 1-row threshold cross-join and a LEFT ANTI join on the custkey.
    // The threshold is float-SAFE across engines: exact-decimal sum ÷
    // exact count, ONE IEEE division both sides compute identically —
    // a plain avg() would make the cut partition-order-dependent at
    // the boundary. The dormancy date is a pushed range filter on the
    // anti side.
    "j15_sales_opportunity" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val thr = cust.filter(col("c_acctbal") > 0.0)
        .agg(davg(col("c_acctbal")).as("thr"))
      cust
        .crossJoin(broadcast(thr))
        .filter(col("c_acctbal") > col("thr"))
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
          .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy("c_mktsegment")
    }),

    // J16 (TPC-H Q19 shape): disjunctive predicate revenue — the
    // OR-of-ANDs filter (three brand/size/quantity bands) spanning
    // both tables. Catalyst projects the disjunction onto each SIDE
    // and pushes both OR-trees to the scans (PushedFilters shows the
    // quantity-OR on lineitem and the brand/size-OR on part), then
    // evaluates the full cross-table disjunction as a residual on the
    // partkey equi-join — one join, one fact scan, no
    // union-of-three-joins rewrite (which would scan the fact three
    // times).
    "j16_disjunctive_revenue" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      val band = (brand: String, szLo: Int, szHi: Int, qLo: Double, qHi: Double) =>
        col("p_brand") === brand &&
        col("p_size").between(szLo, szHi) &&
        col("l_quantity").between(qLo, qHi)
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(band("Brand#2", 1, 15, 1, 20) ||
                band("Brand#4", 10, 30, 10, 35) ||
                band("Brand#19", 20, 50, 20, 50))
        .agg(dsumExpr(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"), count(lit(1)).as("n_lines"))
    }),

    // D5: SCD Type 2 — the events stream as a per-user status change
    // log, versioned with validity intervals.
    "d5_scd2_history" -> ((s, d) =>
      graft.dims.Scd2.fromChangeLog(
        Tables.events(s, d).select("user_id", "ts", "event_id", "event_type"),
        "user_id", "ts", "event_id", Seq("event_type"))
        .orderBy(asc_nulls_first("user_id"), col("version"))),

    // A20 (TPC-H Q1 shape): the pricing summary — one wide
    // groupBy(2 low-cardinality keys) with eight aggregates over derived
    // measures, THE map-side-combine benchmark query: partials collapse
    // to ~6 groups per task before the (tiny) shuffle, and every
    // money/ratio sum rides exact decimal so the result is bit-stable
    // under any partitioning (util.Det). The ship-date band is a pushed
    // scan filter.
    "a20_pricing_summary" -> ((s, d) =>
      // Q1's partial aggregate (8 exact-decimal sums) runs inside the
      // scan stage — widen the single-row-group gate input (identity at
      // production scan widths; measured 1.6 -> 0.96 s; see ScanTuning)
      graft.util.ScanTuning.ensureParallelism(
          Tables.lineitem(s, d), col("l_orderkey"))
        .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsumExpr(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          dsumExpr(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")),

    // A19: correlation profile — Pearson r between order price and
    // order date per status, computed from EXACT fixed-point sums
    // (cents × day numbers as decimals; Σx Σy Σxy Σx² Σy² are
    // order-independent integers) with doubles entering only in the
    // final per-group combine, where both engines do the same IEEE
    // round-to-nearest ops in the same order. The built-in corr() is a
    // float accumulator — partition-order-dependent in the last bits —
    // which is exactly what this formulation avoids; the map-side
    // combine stays one codegen'd pass. Widths: DECIMAL(18,0) inputs
    // keep every product ≤ DECIMAL(36,0), inside both engines' 38-digit
    // exact range.
    "a19_corr_exact" -> ((s, d) => {
      val base = Tables.orders(s, d)
        .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
        .select(col("o_orderstatus"),
          (col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("decimal(18,0)").as("x"),
          datediff(col("o_orderdate").cast("date"), lit("1990-01-01").cast("date"))
            .cast("decimal(18,0)").as("y"))
      def dbl(c: org.apache.spark.sql.Column) = c.cast("double")
      val agg = base.groupBy("o_orderstatus").agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      agg.select(col("o_orderstatus"), col("n"),
        ((dbl(col("n")) * dbl(col("sxy")) - dbl(col("sx")) * dbl(col("sy"))) /
          sqrt((dbl(col("n")) * dbl(col("sxx")) - dbl(col("sx")) * dbl(col("sx"))) *
               (dbl(col("n")) * dbl(col("syy")) - dbl(col("sy")) * dbl(col("sy")))))
          .as("corr_price_day"))
        .orderBy("o_orderstatus")
    }),

    // K8: incremental aggregate maintenance — the materialized-view
    // delta pattern the reference's daily batch lacks (it truncates and
    // recomputes the warehouse every run; `Airflow.py:22` cadence). A
    // per-customer running aggregate is kept as a STORED snapshot; each
    // new batch folds in as snapshot ∪ delta-partials → re-aggregate on
    // the key. Both count and sum are self-combinable, so the merge is
    // exact. At 100 TB the snapshot is KEYS-sized and the delta is
    // BATCH-sized — the fact history is never rescanned (the only scans
    // below the final agg are the snapshot parquet and the delta
    // slice). The oracle is the full recompute over ALL of orders:
    // hash-equality proves the incremental plan maintains the exact
    // aggregate. NULL order dates never match a date predicate, so the
    // delta branch must claim them explicitly or they'd vanish from
    // both sides of the split.
    "k8_incremental_agg" -> ((s, d) => {
      val snapDir = java.nio.file.Files.createTempDirectory("graft_incr_snap_")
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        org.apache.commons.io.FileUtils.deleteQuietly(snapDir.toFile): Unit))
      val cutoff = lit("1998-01-01").cast("timestamp")
      def partials(df: DataFrame) = df.groupBy("o_custkey").agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))
      // day 0: aggregate the history once, persist the snapshot
      partials(Tables.orders(s, d).filter(col("o_orderdate") < cutoff))
        .write.mode("overwrite").parquet(snapDir.toString)
      // day 1+: fold the new batch into the stored snapshot
      val snapshot = s.read.parquet(snapDir.toString)
      val delta = Tables.orders(s, d)
        .filter(col("o_orderdate") >= cutoff || col("o_orderdate").isNull)
      snapshot.unionByName(partials(delta))
        .groupBy("o_custkey")
        .agg(sum("n_orders").as("n_orders"), sum("total").as("total"))
        .select(col("o_custkey"), col("n_orders"),
          col("total").cast("double").as("total"))
        .orderBy("o_custkey")
    }),

    // F-evolution (SURVEY §7.1): unionByName(allowMissingColumns) — the
    // CDC schema-evolution merge of an old and a new message shape.
    "f22_union_by_name" -> ((s, d) => {
      val v1 = Tables.orders(s, d).filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_totalprice")
      val v2 = Tables.orders(s, d).filter(col("o_orderkey") % 2 === 1)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
      v1.unionByName(v2, allowMissingColumns = true).orderBy("o_orderkey")
    }),

    // J17 (TPC-H Q20 shape): excess-inventory suppliers — the nested
    // semi-join chain j9-j16 don't exercise: a correlated scalar
    // aggregate qualifies (part, supplier) pairs, which feed a supplier
    // semi-join, gated by a region dim chain. This schema has no
    // partsupp, so the partsupp analog is lineitem's (l_partkey,
    // l_suppkey) grain: "availqty" = all-time shipped quantity, and the
    // correlated agg is the 1997 slice of the SAME pairs. The oracle
    // states the textbook correlated-subquery form (a scalar SUM
    // re-correlated per pair); here both aggregates decorrelate into
    // ONE conditional-aggregate shuffle on (partkey, suppkey) — the
    // fact is scanned once, pre-pruned by the broadcast part-name
    // filter — then two LEFT SEMI joins (nation-region gate broadcast,
    // qualifying pairs small). All comparisons stay in exact decimal;
    // qty_1997 > 0 reproduces the oracle's NULL-scalar exclusion.
    "j17_excess_parts" -> ((s, d) => {
      val qualParts = broadcast(Tables.part(s, d)
        .filter(col("p_name").like("small%")).select("p_partkey"))
      val y0 = lit("1997-01-01").cast("timestamp")
      val y1 = lit("1998-01-01").cast("timestamp")
      val qdec = col("l_quantity").cast("decimal(18,2)")
      val excess = Tables.lineitem(s, d)
        .join(qualParts, col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(qdec).as("avail_qty"),
          sum(when(col("l_shipdate") >= y0 && col("l_shipdate") < y1, qdec)
            .otherwise(lit(0).cast("decimal(18,2)"))).as("qty_1997"))
        .filter(col("qty_1997") > 0 && col("avail_qty") > col("qty_1997") * 2)
      val euroNations = broadcast(Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey"))
      Tables.supplier(s, d)
        .join(euroNations, col("s_nationkey") === col("n_nationkey"), "left_semi")
        .join(excess.select("l_suppkey"),
          col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_name", "s_suppkey")
    }),

    // J18 (TPC-H Q2 shape): min-cost supplier — the correlated MIN()
    // subquery over a multi-way dim join (part ⋈ cost ⋈ supplier ⋈
    // nation ⋈ region), the last uncovered decorrelation topology. The
    // partsupp "supplycost" analog is the best historical unit deal:
    // MIN(l_extendedprice) per (l_partkey, l_suppkey). The oracle keeps
    // Q2's correlated form (cost = scalar MIN over region suppliers of
    // the same part); here it decorrelates into a per-part WINDOW MIN
    // over the already-region-filtered frame — the fact pays one
    // (partkey, suppkey) agg shuffle, the dims broadcast, and the
    // window exchange runs over the parts×region-suppliers frame, never
    // the fact. cost == min_cost compares raw parquet doubles with no
    // arithmetic, so equality is exact on both engines; the ORDER
    // BY...LIMIT rides a total order (names unique, partkey distinct
    // within supplier) so the cut is deterministic.
    "j18_min_cost_supplier" -> ((s, d) => {
      val cost = Tables.lineitem(s, d)
        .groupBy("l_partkey", "l_suppkey")
        .agg(min("l_extendedprice").as("cost"))
      val regionSupp = broadcast(Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d).filter(col("r_name") === "AMERICA")),
            col("n_regionkey") === col("r_regionkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
      val qualParts = broadcast(Tables.part(s, d)
        .filter(col("p_type") === "STANDARD" && col("p_size") <= 25)
        .select("p_partkey", "p_brand"))
      val w = Window.partitionBy("p_partkey")
      cost
        .join(regionSupp, col("l_suppkey") === col("s_suppkey"))
        .join(qualParts, col("l_partkey") === col("p_partkey"))
        .withColumn("min_cost", min("cost").over(w))
        .filter(col("cost") === col("min_cost"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_brand"), col("cost"))
        .orderBy(desc("s_acctbal"), col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    }),

    // J19 (TPC-H Q13 shape): customer order-count distribution — LEFT
    // OUTER join with a RESIDUAL predicate on the join condition plus
    // an aggregate-of-aggregate. The NOT LIKE lives in the join
    // condition, not after it: a post-join filter would drop the
    // null-extended rows and lose exactly the zero-order customers the
    // distribution exists to count (Catalyst pushes the right-side-only
    // predicate below the join — equivalent for LEFT OUTER, and it
    // prunes the shuffled side; TpchSubquerySpec pins both the join
    // type and that no post-join Filter touches the priority). The
    // per-customer count reuses the join's custkey partitioning (no
    // second fact exchange); the distribution agg runs over the
    // customers-sized frame.
    "j19_order_distribution" -> ((s, d) => {
      val perCust = Tables.customer(s, d)
        .join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey") &&
            !col("o_orderpriority").like("%URGENT%"),
          "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    }),

    // J20 (TPC-H Q16 shape): supplier-part relationship counts — the
    // NOT IN exclusion subquery plus COUNT(DISTINCT) over the
    // relationship grain. The oracle keeps the NOT IN form; with a
    // non-nullable key (s_suppkey, by schema) NOT IN ≡ LEFT ANTI, which
    // is what the engine plans — the anti join runs against the
    // BROADCAST 6-row exclusion set BEFORE the part join, so excluded
    // suppliers' pairs never shuffle further. (A nullable exclusion
    // key would need Spark's null-aware anti join — the SQL entry
    // point plans exactly that from the same NOT IN text.) The
    // relationship grain dedups (partkey, suppkey) in one fact
    // shuffle; COUNT(DISTINCT suppkey) then rides the
    // (brand, type, size) aggregate with suppkey as the expand key.
    "j20_supplier_part_counts" -> ((s, d) => {
      val ps = Tables.lineitem(s, d).select("l_partkey", "l_suppkey").distinct()
      val badSupp = broadcast(Tables.supplier(s, d)
        .filter(col("s_acctbal") < 0).select("s_suppkey"))
      val qualParts = broadcast(Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#3" && !col("p_type").like("PROMO%") &&
          col("p_size").isin(5, 10, 15, 20, 25, 30))
        .select("p_partkey", "p_brand", "p_type", "p_size"))
      ps.join(badSupp, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(qualParts, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("l_suppkey").as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"), col("p_size"))
    }),

    // J21 (TPC-H Q11 shape): value concentration — HAVING against a
    // scalar subquery over the SAME aggregate (parts whose revenue
    // exceeds 1/1500 of the corpus total). The per-part aggregate is
    // built ONCE; the global total re-aggregates that same subtree, so
    // Catalyst's ReuseExchange collapses the two identical partial-agg
    // exchanges into one — the fact is scanned and shuffled once, not
    // twice (spec pins the ReusedExchange/table-cache-free reuse). The
    // threshold comparison is float-free: value·1500 > Σvalue in exact
    // decimal, identical on both engines; the 1-row total broadcasts.
    "j21_part_value_share" -> ((s, d) => {
      val pv = Tables.lineitem(s, d)
        .groupBy("l_partkey")
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("value"))
      val total = pv.agg(sum("value").as("total"))
      pv.crossJoin(broadcast(total))
        .filter(col("value") * 1500 > col("total"))
        .select(col("l_partkey"), col("value").cast("double").as("value"))
        .orderBy(desc("value"), col("l_partkey"))
    }),

    // J22 (TPC-H Q7 shape): volume shipping between two nations — the
    // DISJUNCTIVE nation-pair predicate ((n1,n2) OR (n2,n1)) over a
    // two-year shipdate slice. Both dim sides pre-filter to the two
    // nations BEFORE touching the fact: the supplier side broadcasts
    // (suppliers of 2/25 nations are dim-sized at any scale) and prunes
    // the fact at the scan join; the customer side arrives through the
    // orders join and the disjunction collapses to a cheap
    // supp≠cust residual on two already-restricted slim attributes —
    // the fact is never joined against un-filtered dims.
    "j22_volume_shipping" -> ((s, d) => {
      val nat = Tables.nation(s, d)
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
        .select("n_nationkey", "n_name")
      val supp = broadcast(Tables.supplier(s, d)
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation")))
      val cust = Tables.customer(s, d)
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          yr("l_shipdate").as("l_year"))
        .agg(dsumExpr(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // J23 (TPC-H Q8 shape): national market share — the CASE-inside-
    // aggregate RATIO per group (share of one supplier nation within a
    // region's customers for one part type). Both sums ride ONE
    // conditional aggregate over a single fact pass; the ratio is
    // emitted as an exact integer ppm (floor to whole currency units,
    // then integer division — float-free, so the hash gate covers the
    // division itself). Headroom: nation_rev is whole units, so the
    // ×1e6 stays in BIGINT up to ~9.2e12 revenue units per year.
    "j23_market_share" -> ((s, d) => {
      val amCust = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d).filter(col("r_name") === "AMERICA")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey")),
          col("c_nationkey") === col("n_nationkey"), "left_semi")
        .select("c_custkey")
      val ecoParts = broadcast(Tables.part(s, d)
        .filter(col("p_type") === "ECONOMY").select("p_partkey"))
      val suppNat = broadcast(Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d).select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation")))
      val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      Tables.lineitem(s, d)
        .join(ecoParts, col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(amCust, col("o_custkey") === col("c_custkey"), "left_semi")
        .join(suppNat, col("l_suppkey") === col("s_suppkey"))
        .groupBy(yr("o_orderdate").as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_3", vol).otherwise(lit(0.0))
            .cast("decimal(28,6)")).as("num"),
          sum(vol.cast("decimal(28,6)")).as("den"))
        .select(col("o_year"),
          floor(col("num")).cast("long").as("nation_rev"),
          floor(col("den")).cast("long").as("total_rev"))
        .withColumn("share_ppm", expr("nation_rev * 1000000 div total_rev"))
        .orderBy("o_year")
    }),

    // J24 (TPC-H Q9 shape): product profit by nation and year. This
    // schema has no partsupp.supplycost; the analog is the best
    // historical UNIT price per (part, supplier): min(extendedprice /
    // quantity) over the pair's own lines. Q9's agg-then-rejoin is
    // expressed as a per-pair WINDOW MIN instead — the filtered fact
    // pays ONE (partkey, suppkey) shuffle and is scanned once, vs the
    // textbook form's second scan + second shuffle for the cost table
    // (the oracle states that textbook form; hash-equality proves the
    // window formulation exact, min being duplicate- and
    // order-insensitive). The part-name filter broadcasts and prunes
    // the fact before the window shuffle. Unlike the pure-revenue
    // queries, the per-row profit carries a DIVISION-derived double
    // (unit_cost), whose 6-decimal ROUNDING is not engine-portable —
    // so the measure is fixed-pointed with floor(x·1e6) instead:
    // floor of an identical IEEE double is bit-identical everywhere,
    // and the BIGINT micro sum is order-independent.
    "j24_product_profit" -> ((s, d) => {
      val redParts = broadcast(Tables.part(s, d)
        .filter(col("p_name").like("%red%")).select("p_partkey"))
      val w = Window.partitionBy("l_partkey", "l_suppkey")
      Tables.lineitem(s, d)
        .join(redParts, col("l_partkey") === col("p_partkey"))
        .withColumn("unit_cost",
          min(col("l_extendedprice") / col("l_quantity")).over(w))
        .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d).select("n_nationkey", "n_name")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("nation"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("nation"), yr("o_orderdate").as("o_year"))
        .agg(sum(
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(1e6)) -
            floor(col("unit_cost") * col("l_quantity") * lit(1e6)))
          .as("profit_micro"))
        .orderBy(col("nation"), desc("o_year"))
    }),

    // J25 (TPC-H Q10 shape): returned-item customer ranking — revenue
    // lost to returns in one quarter, top 20 customers. The fact
    // aggregates to customer grain BEFORE the customer join (the
    // agg-below-join discipline of j12/Q18): the wide customer
    // attributes join a customers-sized aggregate, never the fact. The
    // LIMIT rides (revenue DESC, c_custkey) — a total order, so the
    // cut is deterministic across engines.
    "j25_returned_items" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
          .select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(dsumExpr(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d).select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          col("c_acctbal"), col("n_name"), col("c_mktsegment"))
        .orderBy(desc("revenue"), col("c_custkey"))
        .limit(20)),

    // J26 (TPC-H Q14 shape): promotion revenue share — the single-row
    // CASE-ratio over a one-month slice. Same exact-ppm discipline as
    // j23: both sums in one conditional aggregate, floor to whole
    // units, integer division.
    "j26_promo_share" -> ((s, d) => {
      val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
        .join(broadcast(Tables.part(s, d).select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", vol).otherwise(lit(0.0))
            .cast("decimal(28,6)")).as("num"),
          sum(vol.cast("decimal(28,6)")).as("den"))
        .select(floor(col("num")).cast("long").as("promo_rev"),
          floor(col("den")).cast("long").as("total_rev"))
        .withColumn("promo_ppm", expr("promo_rev * 1000000 div total_rev"))
    }),

    // J27 (TPC-H Q15 shape): top supplier — suppliers whose quarterly
    // revenue EQUALS the global max of that same aggregate. Like j21,
    // the per-supplier aggregate subtree is built once and re-read for
    // the scalar max, so ReuseExchange collapses the two partial-agg
    // exchanges; the 1-row max broadcasts and the equality compares
    // exact decimals (ties all surface, ordered by s_suppkey).
    "j27_top_supplier" -> ((s, d) => {
      // the isNotNull sits on the SHARED base (not implied by the later
      // supplier join alone) so both consumers' partial-agg exchanges
      // canonicalize identically — without it the join-side branch
      // picks up the constraint and AQE cannot reuse the stage
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp") &&
          col("l_suppkey").isNotNull)
        .groupBy("l_suppkey")
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(28,6)")).as("total_rev"))
      rev.crossJoin(broadcast(rev.agg(max("total_rev").as("mx"))))
        .filter(col("total_rev") === col("mx"))
        .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast("double").as("total_rev"))
        .orderBy("s_suppkey")
    }),

    // J28 (TPC-H Q6 shape): forecast-revenue change — the pure
    // scan-filter-aggregate (no join at all): every predicate reaches
    // the parquet scan as a pushed filter, the aggregate is one
    // map-side-combined pass. Included to complete the TPC-H surface;
    // with j22-j27 every Q expressible on this schema is covered
    // directly; Q12's canonical columns (l_shipmode/commit/receipt
    // dates) are absent, so its SHAPE is carried by j29 on stand-ins.
    "j28_forecast_revenue" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(dsumExpr(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n_lines"))),

    // J29 (TPC-H Q12 shape): shipping-mode service-level audit — the
    // two-class CASE conditional aggregate over the fact⋈orders join.
    // The generated schema carries no l_shipmode/l_commitdate/
    // l_receiptdate, so the SHAPE runs on stand-ins: l_returnflag is
    // the 2-value IN-filtered mode column, o_orderpriority drives the
    // high/low split. Both counts ride ONE conditional aggregate in a
    // single fact pass; the mode IN-list and the shipdate year slice
    // reach the parquet scan as pushed filters BEFORE the join, so
    // only ~1/3 of one year of the fact shuffles. At 100 TB the join
    // shuffles on orderkey either way; with both tables bucketed on
    // orderkey (sources.BucketedLayout, measured in q_bucketed_join)
    // it is exchange-free.
    "j29_shipmode_priority" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_returnflag").isin("A", "R") &&
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select("l_orderkey", "l_returnflag")
        .join(Tables.orders(s, d).select("o_orderkey", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag").as("shipmode"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy("shipmode")),

    // X126: ABC/Pareto classification by revenue MASS — parts classed
    // A (smallest top-revenue set covering 80% of total), B (→95%),
    // C (rest). The textbook form is a global cumulative sum over
    // parts sorted by revenue — an un-partitioned Window, the lint's
    // one forbidden shape. Scale-correct form: coarse revenue BANDS
    // (rev div 2²⁰) — band order is total because b·D ≤ rev < (b+1)·D,
    // so any higher band strictly out-earns any lower — then the
    // band prefix from a bounded TRIANGULAR join over the band summary
    // (the x27 seq-pack move, no window at all) plus a band-PARTITIONED
    // within-band cumsum. cum_before is exact integer cents; the class
    // cuts compare cum·100 against total·80/95 with no division. The
    // oracle states the naive global-sort definition outright, so the
    // hash gate proves banded ≡ sorted (the x77/tiles discipline).
    "x110_abc_classes" -> ((s, d) => {
      val pv = Tables.lineitem(s, d)
        .groupBy("l_partkey")
        .agg(sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long")).as("rev_c"))
      val withCb = pv.withColumn("cb", expr("rev_c div 1048576"))
      val bsum = withCb.groupBy("cb").agg(sum("rev_c").as("bmass"))
      val bpre = bsum
        .join(bsum.select(col("cb").as("cb2"), col("bmass").as("bm2")),
          col("cb2") > col("cb"), "left")
        .groupBy("cb").agg(coalesce(sum("bm2"), lit(0L)).as("bprefix"))
      val total = pv.agg(sum("rev_c").as("total_c"))
      val w = Window.partitionBy("cb")
        .orderBy(desc("rev_c"), col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      withCb.join(broadcast(bpre), "cb")
        .withColumn("cum_before",
          col("bprefix") + sum("rev_c").over(w) - col("rev_c"))
        .crossJoin(broadcast(total))
        .withColumn("abc_class",
          when(col("cum_before") * 100 < col("total_c") * 80, "A")
            .when(col("cum_before") * 100 < col("total_c") * 95, "B")
            .otherwise("C"))
        .groupBy("abc_class", "total_c")
        .agg(count(lit(1)).as("n_parts"), sum("rev_c").as("class_rev_c"))
        // ×1e6 overflows a long on corpus-scale cents (caught by the
        // 100× probe) — widen to decimal for the product, result ≤ 1e6
        .withColumn("share_ppm",
          expr("cast(class_rev_c as decimal(38,0)) * 1000000 div total_c"))
        .select("abc_class", "n_parts", "class_rev_c", "share_ppm")
        .orderBy("abc_class")
    }),

    // X127: sequence gap islands — the data-quality read "which id
    // ranges are missing" (dropped orders, lost CDC offsets) over
    // lineitem's order keys (257 orders carry no lines at this SF —
    // real gaps). The textbook lag-over-global-sort is again the
    // forbidden un-partitioned Window; the two-phase form buckets ids
    // (div 8192), finds within-bucket gaps under a bucket-PARTITIONED
    // lead, and closes bucket-boundary gaps from the bounded bucket
    // summary — next id after a bucket's max = MIN over higher
    // buckets' mins, a triangular join + min aggregate, no window.
    // Empty buckets fall out naturally (the boundary pair spans them).
    "x111_id_gaps" -> ((s, d) => {
      val ids = Tables.lineitem(s, d).select("l_orderkey").distinct()
        .withColumn("bk", expr("l_orderkey div 8192"))
      val w = Window.partitionBy("bk").orderBy("l_orderkey")
      val within = ids
        .withColumn("nxt", lead("l_orderkey", 1).over(w))
        .filter(col("nxt") > col("l_orderkey") + 1)
        .select((col("l_orderkey") + 1).as("gap_start"),
          (col("nxt") - 1).as("gap_end"))
      val bs = ids.groupBy("bk")
        .agg(min("l_orderkey").as("bmin"), max("l_orderkey").as("bmax"))
      val boundary = bs
        .join(bs.select(col("bk").as("bk2"), col("bmin").as("bmin2")),
          col("bk2") > col("bk"), "left")
        .groupBy("bk", "bmax").agg(min("bmin2").as("next_id"))
        .filter(col("next_id") > col("bmax") + 1)
        .select((col("bmax") + 1).as("gap_start"),
          (col("next_id") - 1).as("gap_end"))
      within.unionByName(boundary)
        .withColumn("gap_len", col("gap_end") - col("gap_start") + 1)
        .orderBy("gap_start")
    }),

    // X128: RFM segmentation — the classic customer scoring read
    // (Recency / Frequency / Monetary quintiles, 0 = best) on the
    // order-collapsed customer grain. Each quintile is an EXACT global
    // n-tile via TopFrac.tiles (histogram refinement — the only
    // unpartitioned window runs over the metadata-sized histogram,
    // never the customer dimension, which at 100 TB is billions of
    // rows). Recency inverts into a "bigger is better" integral score
    // (1e6 − days-since-anchor) so one tiling primitive serves all
    // three axes; ties break on custkey everywhere, so the tile
    // assignment is unique and the oracle's naive global-sort ntile
    // reproduces it bit-for-bit. The segment label is a pure CASE over
    // the three tiles. At 100 TB the grain aggregate would persist
    // once and feed all three tilings; here each tiling re-derives it
    // (6 order scans total at gate SF — the plan shape, not the
    // materialization policy, is what carries to scale).
    "x112_rfm_segments" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val grain = o.groupBy(col("o_custkey").as("custkey"))
        .agg(max(to_date(col("o_orderdate"))).as("last_day"),
          count(lit(1)).as("n_orders"),
          sum((col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")).as("spend_c"))
      val anchor = o.agg(max(to_date(col("o_orderdate"))).as("anchor_day"))
      val base = grain.crossJoin(broadcast(anchor))
        .withColumn("rec_score",
          lit(1000000L) - datediff(col("anchor_day"), col("last_day")))
      import graft.util.TopFrac
      val r = TopFrac.tiles(base.select("custkey", "rec_score"),
          "rec_score", "custkey", 5, 64L)
        .select(col("custkey"), col("tile").as("r_tile"))
      val f = TopFrac.tiles(base.select("custkey", "n_orders"),
          "n_orders", "custkey", 5, 4L)
        .select(col("custkey"), col("tile").as("f_tile"))
      val m = TopFrac.tiles(base.select("custkey", "spend_c"),
          "spend_c", "custkey", 5, 100000L)
        .select(col("custkey"), col("tile").as("m_tile"))
      r.join(f, Seq("custkey")).join(m, Seq("custkey"))
        .withColumn("segment",
          when(col("r_tile") <= 1 && col("f_tile") <= 1 && col("m_tile") <= 1, "champion")
            .when(col("r_tile") <= 1 && col("f_tile") >= 3, "new")
            .when(col("r_tile") >= 3 && col("f_tile") <= 1, "at_risk")
            .when(col("r_tile") >= 3 && col("f_tile") >= 3, "hibernating")
            .otherwise("regular"))
        .orderBy("custkey")
    }),

    // J30: repeat-purchase interval — days between consecutive orders
    // per customer (lag over the CUSTOMER-partitioned window; ties on
    // the same day break by orderkey on both engines), collapsed to the
    // market-segment read a retention team asks for. The window and the
    // per-customer aggregate share the custkey exchange (one fact
    // shuffle); the customer join runs on the already-collapsed
    // customer grain (dim⋈dim at any scale); the final segment rollup
    // is a bounded-key aggregate. Mean gap = one terminal division of
    // two exact integer sums.
    "j30_reorder_gap" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("day"), col("o_orderkey"))
      val gaps = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("day"))
        .withColumn("prev_day", lag("day", 1).over(w))
        .filter(col("prev_day").isNotNull)
        .withColumn("gap_days", datediff(col("day"), col("prev_day")).cast("long"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_gaps"), sum("gap_days").as("sum_gap"))
      gaps.join(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          sum("n_gaps").as("n_gaps"),
          sum("sum_gap").as("sum_gap_days"))
        .withColumn("mean_gap_days",
          col("sum_gap_days").cast("double") / col("n_gaps").cast("double"))
        .orderBy("mktsegment")
    }),

    // A25: deterministic per-group MODE — most frequent order priority
    // per order month, ties broken to the lexicographically smallest
    // value (SQL's mode() leaves ties implementation-defined on both
    // engines, so the tie rule is stated outright and computed the same
    // way on both: max count per group, then min value at that count).
    // Two map-combined aggregates over the bounded (month, priority)
    // grid + one broadcast join — no window, no fact re-shuffle.
    "a25_mode" -> ((s, d) => {
      val cnt = Tables.orders(s, d)
        .groupBy(to_date(date_trunc("month", col("o_orderdate"))).as("ym"),
          col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val mx = cnt.groupBy("ym").agg(max("n").as("n_orders"))
        .withColumnRenamed("ym", "ym2")
      cnt.join(broadcast(mx),
          col("ym") === col("ym2") && col("n") === col("n_orders"))
        .groupBy("ym", "n_orders")
        .agg(min("o_orderpriority").as("mode_priority"))
        .select("ym", "mode_priority", "n_orders")
        .orderBy("ym")
    }),

    // X129: per-group OLS trend — slope/intercept/R² of daily revenue
    // over the day index, per event type (the "is this metric growing
    // and how fast" read behind every KPI dashboard's trendline). The
    // a19 discipline extended from correlation to the full regression
    // triple: collapse to the bounded daily grain first (map-combined),
    // accumulate the five moment sums as EXACT decimals (Σxy at corpus
    // scale overflows a long: days ~1e4 × daily cents ~1e12 × 1e4 days),
    // and convert to double only in the final per-group combine where
    // both engines execute the identical IEEE ops in the identical
    // order — slope first, then intercept FROM the slope column, then
    // R² from the three centered moments. The day index anchors to the
    // global min day (broadcast 1-row aggregate), not a literal, so the
    // query is data-driven at any scale.
    "x114_regr_trend" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(round(col("value") * 100).cast("decimal(18,0)")).as("yv"))
      val anchor = daily.agg(min("day").as("day0"))
      def dbl(c: org.apache.spark.sql.Column) = c.cast("double")
      daily.crossJoin(broadcast(anchor))
        .withColumn("xv", datediff(col("day"), col("day0")).cast("decimal(18,0)"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          sum("xv").as("sx"), sum("yv").as("sy"),
          sum(col("xv") * col("yv")).as("sxy"),
          sum(col("xv") * col("xv")).as("sxx"),
          sum(col("yv") * col("yv")).as("syy"))
        .withColumn("cnum", dbl(col("n_days")) * dbl(col("sxy")) - dbl(col("sx")) * dbl(col("sy")))
        .withColumn("cdenx", dbl(col("n_days")) * dbl(col("sxx")) - dbl(col("sx")) * dbl(col("sx")))
        .withColumn("cdeny", dbl(col("n_days")) * dbl(col("syy")) - dbl(col("sy")) * dbl(col("sy")))
        .withColumn("slope_c_per_day", col("cnum") / col("cdenx"))
        .withColumn("intercept_c",
          (dbl(col("sy")) - col("slope_c_per_day") * dbl(col("sx"))) / dbl(col("n_days")))
        .withColumn("r2", (col("cnum") * col("cnum")) / (col("cdenx") * col("cdeny")))
        .select("event_type", "n_days", "slope_c_per_day", "intercept_c", "r2")
        .orderBy("event_type")
    }),

    // X131: robust spread — per-type median and MAD (median absolute
    // deviation) of the event value in exact cents: the outlier-immune
    // (median, MAD) pair a monitoring stack prefers over (mean, σ),
    // which one fat-fingered amount drags arbitrarily (x94's winsorized
    // mean is the KPI-side cousin; this is the dispersion side). Both
    // medians are exact per-group quantile_cont(0.5) via
    // util.GroupedMedian histogram refinement — no group-sized sort, no
    // percentile() reducer buffer; the group medians broadcast back as
    // metadata and deviations stay integral (dev2 = |2v − med2| = 2·dev)
    // so the second median is exact too. Doubles appear only in the two
    // terminal halvings (quarter-integers — exactly representable).
    "x115_mad_spread" -> ((s, d) => {
      import graft.util.GroupedMedian
      val e = Tables.events(s, d)
        .select(col("event_type"), round(col("value") * 100).cast("long").as("vc"))
      val med = GroupedMedian.med2(e, "event_type", "vc", 100L)
      val dev = e.join(broadcast(med), Seq("event_type"))
        .select(col("event_type"), abs(col("vc") * 2 - col("med2")).as("dev2"))
      val mad = GroupedMedian.med2(dev, "event_type", "dev2", 100L)
        .withColumnRenamed("med2", "mad4")
      med.join(mad, Seq("event_type"))
        .join(e.groupBy("event_type").agg(count(lit(1)).as("n_obs")), Seq("event_type"))
        .select(col("event_type"), col("n_obs"),
          (col("med2").cast("double") / 2.0).as("median_cents"),
          (col("mad4").cast("double") / 4.0).as("mad_cents"))
        .orderBy("event_type")
    }),

    // X132: linear multi-touch attribution — each purchase's value
    // splits EQUALLY across the view touchpoints in its trailing 1-hour
    // window, and the earned credit rolls up by the hour-of-day of the
    // VIEW (when does influential exposure happen). The marketing read
    // x90/x103 lead to: not "did a view precede", but "how much revenue
    // does each exposure slot earn". Both directions ride RANGE frames
    // over ONE user-keyed shuffle on exact micros: a purchase counts
    // its in-window views backward (conditional count over
    // [−1h, now]), a view collects its per-purchase shares forward
    // ([now, +1h]) — the two frames are set-based on the micros axis,
    // so same-instant ties resolve identically on both engines, and
    // view v is credited by purchase p iff p counted v (the windows are
    // exact mirrors). Shares are integer micro-cents (vc·1e6 div
    // n_touch — floored identically on both engines); purchases with
    // no view in window stay unattributed by definition. The final
    // rollup is a bounded 24-row aggregate.
    "x116_attribution" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy("us")
      val back = byUser.rangeBetween(-3600000000L, 0L)
      val fwd = byUser.rangeBetween(0L, 3600000000L)
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"),
          round(col("value") * 100).cast("long").as("vc"))
        .withColumn("us", unix_micros(col("ts").cast("timestamp")))
        .withColumn("n_touch",
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).over(back))
        .withColumn("share_uc",
          when(col("event_type") === "purchase" && col("n_touch") > 0,
            expr("vc * 1000000 div n_touch")))
        .withColumn("earned_uc",
          sum("share_uc").over(fwd))
        .filter(col("event_type") === "view" && col("earned_uc").isNotNull)
        .groupBy(hour(col("ts")).as("view_hour"))
        .agg(count(lit(1)).as("n_credited_views"),
          sum("earned_uc").as("credit_microcents"))
        .orderBy("view_hour")
    }),

    // X134: Gini concentration per segment — the inequality KPI behind
    // X126's ABC classes (not "which parts are the A set" but "HOW
    // concentrated is customer spend", the single number a portfolio
    // review tracks). Gini needs Σ rank·spend under a per-segment
    // ascending sort — the banned group-sized window; the X126 band
    // trick supplies EXACT per-row ranks instead: coarse spend bands
    // total-order across bands, lower-band counts come from a bounded
    // triangular join over the (seg, band) summary, within-band ranks
    // are (seg, band)-partitioned. Rank ties (equal spends) permute
    // ranks only within equal values, so Σ rank·spend is
    // tie-invariant — deterministic without any tie rule. Products run
    // in decimal (rank·cents ~1e19 edges a long); the Gini is a fixed
    // IEEE op order over the two exact sums.
    "x118_gini" -> ((s, d) => {
      val cv = Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long")).as("spend_c"))
      val j = cv.join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment").as("seg")),
          col("o_custkey") === col("c_custkey"))
        .select(col("seg"), col("o_custkey"), col("spend_c"))
        .withColumn("cb", expr("spend_c div 1048576"))
      val bsum = j.groupBy("seg", "cb").agg(count(lit(1)).as("bc"))
      val bpre = bsum.as("a")
        .join(bsum.select(col("seg").as("seg2"), col("cb").as("cb2"),
          col("bc").as("bc2")), col("seg2") === col("seg") && col("cb2") < col("cb"), "left")
        .groupBy("seg", "cb").agg(coalesce(sum("bc2"), lit(0L)).as("below"))
      val w = Window.partitionBy("seg", "cb").orderBy("spend_c", "o_custkey")
      j.join(broadcast(bpre), Seq("seg", "cb"))
        .withColumn("rk", col("below") + row_number().over(w))
        .groupBy("seg")
        .agg(count(lit(1)).as("n_customers"),
          sum(col("spend_c").cast("decimal(38,0)")).as("sx"),
          sum(col("rk").cast("decimal(19,0)")
            * col("spend_c").cast("decimal(19,0)")).as("srx"))
        .select(col("seg"), col("n_customers"),
          col("sx").cast("long").as("spend_total_c"),
          expr("""(2 * CAST(srx AS DOUBLE) - CAST(n_customers + 1 AS DOUBLE) * CAST(sx AS DOUBLE))
                  / (CAST(n_customers AS DOUBLE) * CAST(sx AS DOUBLE))""").as("gini"))
        .orderBy("seg")
    }),

    // Q-SKEW (SURVEY §6.1 mitigation row, measured): the same
    // deliberately skewed join — ~80% of the fact collapsed onto ONE
    // supplier key — computed plain and salted. `shuffle_hash` on the
    // dim pins the shuffled strategy on both forms: at this SF the dim
    // would broadcast (no skew problem at all), at 100 TB it would not,
    // and a shuffled join is exactly where a hot key floods one task.
    // Plain: every hot-key row lands in one reducer while the other 31
    // threads idle. Salted (util.Skew.saltedJoin, factor 16): the hot
    // key spreads over 16 tasks at the cost of replicating the dim 16×.
    // Identical results (same oracle, hash-compared); BENCH_r09 carries
    // both timings — the measured number behind §6.1's "salt it" rows.
    "q_skew_plain" -> ((s, d) =>
      skewAgg(skewFact(s, d).join(
        Tables.supplier(s, d).hint("shuffle_hash"),
        col("skew_key") === col("s_suppkey")))),

    "q_skew_salted" -> ((s, d) =>
      skewAgg(graft.util.Skew.saltedJoin(
        skewFact(s, d), Tables.supplier(s, d), "skew_key", "s_suppkey",
        saltFactor = 16, smallHint = Some("shuffle_hash")))),

    // K9: incremental JOIN-view maintenance — the join analog of k8's
    // aggregate fold. The standing view is a fact⋈dim aggregate
    // (lineitem⋈orders by priority); history arrives in two planes
    // (old lineitems by shipdate, a late "backfill" batch of orders),
    // and the view folds in the classic delta algebra
    //   V(L∪ΔL ⋈ O∪ΔO) = P(L⋈O) ⊎ P(ΔL⋈O) ⊎ P(L⋈ΔO) ⊎ P(ΔL⋈ΔO)
    // where P() is the partial aggregate (count/sum are combinable, so
    // ⊎ is one re-aggregate of four partial tables and the result is
    // EXACTLY the full recompute — the oracle states the recompute, so
    // hash-equality proves the algebra). The expensive quadrant P(L⋈O)
    // is the stored snapshot (parquet, computed once — the k8 shape);
    // each refresh pays only the three delta quadrants, i.e. |Δ|-sized
    // joins instead of a history² rescan. At 100 TB: L⋈ΔO prunes to
    // the orderkey partitions ΔO touches when both sides share the
    // bucketed layout (q_bucketed_join's point); ΔL⋈O broadcasts ΔO's
    // key range; nothing rescans the full fact history on refresh.
    "k9_incremental_join" -> ((s, d) => {
      val snapDir = java.nio.file.Files.createTempDirectory("graft_incr_join_")
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        org.apache.commons.io.FileUtils.deleteQuietly(snapDir.toFile): Unit))
      // day 0: the heavy quadrant, joined once, persisted as the view snapshot
      incrementalJoinSnapshot(s, d).write.mode("overwrite").parquet(snapDir.toString)
      incrementalJoinRefresh(s, d, s.read.parquet(snapDir.toString))
    }),

    // The measured pair for k9: the SAME view maintained by full
    // rescan — what a TRUNCATE-and-reload daily job pays every run
    // (the reference's Airflow.py pattern). Identical output and
    // oracle; in the bench this row is the cost the k9 refresh
    // replaces.
    "q_join_view_full" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("revenue"))
        .orderBy("o_orderpriority")),

    // Q-CHECKSUM: portable bucketed table checksum — the replication /
    // CDC-validation primitive: both ends of a pipeline (here Spark and
    // DuckDB; in production warehouse vs OLTP) compute the same 16-row
    // digest table and compare, localizing any divergence to a key
    // bucket without moving a single row between systems. Each row
    // canonicalizes to an explicit text form (bigints verbatim,
    // money/rates as DECIMAL(18,2), dates as yyyy-MM-dd — the
    // engine-neutral renderings), hashes with md5, and the first 48
    // bits fold into a per-bucket SUM — commutative and associative,
    // so the checksum is partition-order-free and embarrassingly
    // parallel (one map-combined aggregate, no shuffle beyond 16
    // keys). At 100 TB the bucket key becomes a key RANGE instead of a
    // modulus so a mismatched bucket can recursively re-bucket to
    // bisect down to the divergent rows (the classic table-diff
    // protocol); sums go DECIMAL(38,0) so no row count overflows. The
    // canon contract assumes the fact's NOT NULL schema (true here);
    // nullable columns would take an explicit COALESCE on both ends
    // (concat_ws's skip-nulls and ||'s null-propagation differ).
    "q_table_checksum" -> ((s, d) => {
      val canon = concat_ws("|",
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
        col("l_quantity").cast("decimal(18,2)"),
        col("l_extendedprice").cast("decimal(18,2)"),
        col("l_discount").cast("decimal(18,2)"),
        col("l_tax").cast("decimal(18,2)"),
        col("l_returnflag"), col("l_linestatus"),
        date_format(col("l_shipdate"), "yyyy-MM-dd"))
      // per-row md5 over every column is CPU-dense in the scan stage —
      // widen the single-row-group gate input (identity at production
      // scan widths; measured 1.8 -> 1.15 s; see ScanTuning)
      graft.util.ScanTuning.ensureParallelism(
          Tables.lineitem(s, d), col("l_orderkey"))
        .select(pmod(col("l_orderkey"), lit(16L)).as("bucket"),
          conv(substring(md5(canon), 1, 12), 16, 10)
            .cast("decimal(38,0)").as("digest"))
        .groupBy("bucket")
        // the folded checksum surfaces as a digit string: DECIMAL(38,0)
        // values ~5e17 exceed float64's exact-int range, so any
        // comparator that routes decimals through doubles would corrupt
        // them — text is the engine-neutral exact rendering (same
        // philosophy as the canon itself)
        .agg(count(lit(1)).as("n_rows"),
          sum("digest").cast("decimal(38,0)").cast("string").as("checksum"))
        .orderBy("bucket")
    }),

    // X121: Nelson-Aalen survival analysis of time-to-second-order —
    // the churn/repeat-purchase read ("how long until a new customer
    // orders again, and who never does") done properly: customers with
    // only one order are CENSORED at the horizon (the naive mean-gap
    // answer j30 gives silently drops them and biases fast). Per event
    // day t: the risk set n(t) = customers still waiting at t, events
    // d(t), and the cumulative hazard H(t) = Σ_{t'≤t} d/n — kept exact
    // as ppb integers (one integral division per day, then a running
    // long sum), so both engines resolve bit-identical values with
    // zero transcendental ops. Scale shape: one groupBy(cust) pass
    // over orders (min day + second-min day via a per-customer
    // aggregate — no corpus window), then every window runs over the
    // DAY GRID (≤ horizon span rows, metadata-sized — the x113
    // discipline), never the customer table.
    "x121_survival_hazard" -> ((s, d) => {
      val days = Tables.orders(s, d)
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("day"))
      val firsts = days.groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), min("day").as("t1"))
      // second pass on the shared custkey exchange: the second order day
      // is the min day strictly after the first, or the first day again
      // when two orders share it (gap 0)
      val byCust = days.join(firsts, Seq("o_custkey"))
        .groupBy("o_custkey")
        .agg(first("n_orders").as("n_orders"), first("t1").as("t1"),
          min(when(col("day") > col("t1"), col("day"))).as("t2_later"),
          sum(when(col("day") === col("t1"), 1L).otherwise(0L)).as("n_at_t1"))
      val horizon = Tables.orders(s, d)
        .agg(max(to_date(col("o_orderdate"))).as("h"))
      val subjects = byCust.crossJoin(broadcast(horizon))
        .select(col("o_custkey"),
          when(col("n_at_t1") >= 2, lit(0L))
            .when(col("t2_later").isNotNull,
              datediff(col("t2_later"), col("t1")).cast("long"))
            .otherwise(datediff(col("h"), col("t1")).cast("long")).as("t"),
          (col("n_orders") >= 2).cast("long").as("event"))
      val grid = subjects.groupBy("t")
        .agg(count(lit(1)).as("n_at"), sum("event").as("d_at"))
      val total = subjects.agg(count(lit(1)).as("n_total"))
      val wPrev = Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wCum = Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.crossJoin(broadcast(total))
        .withColumn("n_risk",
          col("n_total") - coalesce(sum("n_at").over(wPrev), lit(0L)))
        .filter(col("d_at") > 0)
        .withColumn("hazard_ppb", expr("d_at * 1000000000 div n_risk"))
        .withColumn("cum_hazard_ppb", sum("hazard_ppb").over(wCum))
        .select(col("t").as("t_days"), col("n_risk"), col("d_at").as("d_events"),
          (col("n_at") - col("d_at")).as("n_censored_at"),
          col("hazard_ppb"), col("cum_hazard_ppb"))
        .orderBy("t_days")
    }),

    // A26: sketch-based set-overlap estimation — |A∩B| for two key
    // populations via HLL inclusion-exclusion (|A|+|B|−|A∪B|), the
    // constant-memory way to answer "how much does this year's part
    // mix overlap last year's" without shuffling either distinct set.
    // The a15 verification discipline: exact counts computed alongside
    // (the oracle asserts them outright), and the sketch's verdict is
    // a deterministic boolean — each HLL estimate within 5% of its
    // exact count, the derived intersection within 10% (errors add
    // across three sketches; rsd=0.02 leaves margin, and the estimate
    // is partition-order-invariant so the bit can't flap). At 100 TB
    // the exact columns drop and three ~1.5 KB sketches replace three
    // COUNT(DISTINCT) shuffles — mergeable across any partitioning.
    "a26_overlap_estimate" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_partkey"),
        year(col("l_shipdate")).as("yr"))
        .filter(col("yr") === 1997 || col("yr") === 1998)
      val inA = col("yr") === 1997
      val inB = col("yr") === 1998
      def within(est: org.apache.spark.sql.Column,
                 exact: org.apache.spark.sql.Column,
                 tol: Double): org.apache.spark.sql.Column =
        abs(est.cast("double") - exact.cast("double")) <=
          exact.cast("double") * tol
      // the sketches ride ONE plain pass (HLLs are ordinary aggregate
      // buffers); the exact distincts aggregate the DEDUP'D key table
      // instead — three countDistinct in one aggregate otherwise plan
      // a 4× Expand of the whole fact (measured 18.8 s vs ~4 s at the
      // sf1 replica). Two fact scans beat one 4×-expanded shuffle at
      // any scale, and at 100 TB the exact side drops entirely.
      val sketches = li.agg(
        approx_count_distinct(when(inA, col("l_partkey")), 0.02).as("ea"),
        approx_count_distinct(when(inB, col("l_partkey")), 0.02).as("eb"),
        approx_count_distinct(col("l_partkey"), 0.02).as("eu"))
      val exact = li.distinct().agg(
        countDistinct(when(inA, col("l_partkey"))).as("exact_a"),
        countDistinct(when(inB, col("l_partkey"))).as("exact_b"),
        countDistinct(col("l_partkey")).as("exact_union"))
      exact.crossJoin(sketches)
        .select(col("exact_a"), col("exact_b"),
          (col("exact_a") + col("exact_b") - col("exact_union")).as("exact_inter"),
          within(col("ea"), col("exact_a"), 0.05).as("a_within_5pct"),
          within(col("eb"), col("exact_b"), 0.05).as("b_within_5pct"),
          within(col("ea") + col("eb") - col("eu"),
            col("exact_a") + col("exact_b") - col("exact_union"), 0.10)
            .as("inter_within_10pct"))
    }),

    // D6: point-in-time SCD2 lookup — the CONSUMER of d5's history and
    // the reason SCD2 exists: "what was this user's status when the
    // fact happened". A deterministic fact sample (every 5th event)
    // joins the versioned dimension on user + validity interval
    // [effective_from, effective_to) — half-open, so a fact landing
    // exactly on a change instant reads the NEW version, and
    // same-instant change bursts collapse to the last version (the
    // zero-width intervals d5's lead() produces match nothing, on both
    // engines). Scale shape: the equi-key (user_id) carries the join —
    // Spark plans the interval as a residual filter on the user-keyed
    // SMJ, and per-user version counts bound the probe, so no
    // interval-binning machinery (j6's trick) is needed; exactly one
    // output row per fact.
    "d6_scd2_lookup" -> ((s, d) => {
      val hist = graft.dims.Scd2.fromChangeLog(
        Tables.events(s, d).select("user_id", "ts", "event_id", "event_type"),
        "user_id", "ts", "event_id", Seq("event_type"))
        .withColumnRenamed("user_id", "h_user")
      val facts = Tables.events(s, d)
        .filter(col("event_id") % 5 === 0)
        .select(col("event_id").as("fact_id"), col("user_id"),
          col("ts").as("fact_ts"))
      facts.join(hist, col("user_id") === col("h_user")
          && col("fact_ts") >= col("effective_from")
          && (col("effective_to").isNull || col("fact_ts") < col("effective_to")))
        .select(col("fact_id"), col("user_id"), col("fact_ts"),
          col("event_type").as("status_asof"), col("version"))
        .orderBy("fact_id")
    }),

    // X128: join-cardinality estimation audit — the optimizer's
    // selectivity model run AS data and graded against truth: the
    // partkey self-join size Σc(k)² computed exactly from the key
    // histogram (never by executing the join — the q_join_explosion
    // lesson), beside the classic estimator "top-20 heavy hitters
    // exact + uniform residual" (hot_pairs + n_rest²/d_rest). The gap
    // IS the output: it tells a planner (or a capacity reviewer)
    // whether frequency skew makes the uniform assumption dangerous
    // for THIS key. One map-combined count aggregate, a 20-row
    // TakeOrdered, two 1-row folds; pair counts in DECIMAL(38,0)
    // (corpus-scale Σc² overflows a long); the only signed op is the
    // final double rel_err.
    "x128_join_cardinality" -> ((s, d) => {
      val counts = Tables.lineitem(s, d)
        .groupBy("l_partkey").agg(count(lit(1)).as("c")).cache()
      val hot = counts.orderBy(desc("c"), col("l_partkey")).limit(20)
        .agg(count(lit(1)).as("k_hot"), sum("c").as("n_hot"),
          sum((col("c") * col("c")).cast("decimal(38,0)")).as("hot_pairs"))
      val tot = counts.agg(count(lit(1)).as("d_keys"), sum("c").as("n_rows"),
        sum((col("c") * col("c")).cast("decimal(38,0)")).as("actual_pairs"))
      tot.crossJoin(hot)
        // residual division in pure BIGINT: DECIMAL '//' routes through
        // a float floor in DuckDB (observed off-by-one at a boundary
        // quotient); longs divide exactly on both engines. n_rest ≤
        // 3·10⁹ keeps the square in a long — beyond that the estimator
        // runs per key-range shard and sums, which is also how a real
        // optimizer holds its histogram.
        .withColumn("est_rest", expr(
          """CASE WHEN d_keys > k_hot
               THEN ((n_rows - n_hot) * (n_rows - n_hot)) div (d_keys - k_hot)
               ELSE CAST(0 AS BIGINT) END"""))
        .withColumn("est_pairs",
          (col("hot_pairs") + col("est_rest")).cast("decimal(38,0)"))
        // terminal projection renders the DECIMAL(38,0) pair counts as
        // digit strings: exact at any scale (no float64 round-trip) and
        // hashable by any downstream comparator — the a18 portability
        // convention applied to wide integers
        .select(col("d_keys"), col("n_rows"),
          col("actual_pairs").cast("string").as("actual_pairs"),
          col("est_pairs").cast("string").as("est_pairs"),
          ((col("est_pairs").cast("double") - col("actual_pairs").cast("double"))
            / col("actual_pairs").cast("double")).as("rel_err"))
    }),

    // X125: LOSSLESS edit-distance self-join — j7's heuristic blocks
    // trade recall for speed (a match editing the blocking character is
    // missed by design); this is the exact form via q-gram prefix
    // filtering (FuzzyMatch.prefixEditPairs — the ED companion to
    // x81's lossless Jaccard join). The oracle states the NAIVE
    // all-pairs levenshtein join, so hash-equality PROVES recall 1.0
    // on the data, not just in the theorem.
    "x125_edit_neardups" -> ((s, d) =>
      graft.dedup.FuzzyMatch.prefixEditPairs(
        Tables.customer(s, d).filter(col("c_custkey") <= 2000),
        "c_custkey", "c_name", maxDist = 1)
        .orderBy("id_a", "id_b")),

    // Bucketed-layout pair (sources.BucketedLayout): the SAME
    // orderkey-grain fact⋈fact aggregate over the plain parquet layout
    // (shuffle + sort both sides) and over the bucketed+sorted layout
    // (exchange-free, sort-free SMJ). The gate form materializes the
    // layout inline so the oracle hash covers the whole path; the bench
    // prelude materializes once untimed and times only the join — the
    // warehouse service shape, where the layout is written once and
    // every query after rides it.
    "q_join_plain_layout" -> ((s, d) =>
      graft.sources.BucketedLayout.plainJoinAgg(s, d)),

    "q_bucketed_join" -> ((s, d) => {
      graft.sources.BucketedLayout.materialize(s, d)
      graft.sources.BucketedLayout.bucketedJoinAgg(s)
    }),

    // X232: bounded top-k via a typed Aggregator — top-5 orders by
    // total per priority WITHOUT a window: the window form
    // (row_number over PARTITION BY o_orderpriority) is exactly the
    // hot-key straggler shape the surface lint bans — five partitions,
    // each holding a fifth of the corpus, each sorted in one task —
    // while [[graft.functions.TopKAgg]] keeps a 5-bounded buffer per
    // group per PARTITION and merges: map-side partial aggregation
    // caps the shuffle at k rows per group per input partition and no
    // task sorts more than the buffers it merges. The registry's one
    // typed-Aggregator (`functions.udaf`) face — the custom-AGGREGATE
    // rung of the extension ladder beside the six codegen scalar
    // Expressions. Total buffer order (cents desc, key asc) makes the
    // result partitioning-independent; the oracle states the window
    // form the aggregate replaces, so the hash proves equivalence.
    "x207_topk_agg" -> ((s, d) => {
      val o = Tables.orders(s, d).select(
        col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"),
        col("o_orderkey").as("id"))
      o.groupBy("o_orderpriority")
        .agg(graft.functions.TopKAgg.topk(5)(col("cents"), col("id"))
          .as("top"))
        .select(col("o_orderpriority"), posexplode(col("top")))
        .select(col("o_orderpriority"), (col("pos") + 1).as("rnk"),
          col("col.id").as("o_orderkey"), col("col.cents").as("cents"))
        .orderBy("o_orderpriority", "rnk")
    }),

    // X228: late-data loss curve — the third state-sizing audit beside
    // x186 (session gap) and x174 (dedup TTL): for candidate watermark
    // delays, how many events would a streaming job DROP as late?
    // Arrival times are a deterministic function of the data (event
    // time + event_id-keyed jitter ≤ 2 h — the reproducible stand-in
    // for the ingest log a production audit would read); the watermark
    // is simulated at ROW granularity — max event time over everything
    // earlier in arrival order, minus the delay — which upper-bounds
    // the real batch-granular drop count (Spark only advances the
    // watermark between micro-batches, so the true loss is ≤ this
    // curve; the audit reads as the adversarial bound). The global
    // running max rides the x27 two-phase discipline: hour-grid bucket
    // maxima → prefix max over the BOUNDED grid (the lone
    // un-partitioned window, x113's metadata-grid exemption class) →
    // carry-in + within-bucket running max, each bucket traffic-rate
    // bounded. One explode(4 delays) + map-combined counts close it.
    // This is the number that picks `withWatermark`'s delay: the
    // smallest candidate whose loss ppm is acceptable.
    "x203_lateness_curve" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d).select(
          col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"))
        .withColumn("arr_us",
          col("ts_us") + (col("event_id") % 7200) * 1000000L)
        .withColumn("bkt", expr("arr_us div 3600000000"))
      val grid = ev.groupBy("bkt").agg(max("ts_us").as("bmax"))
      val wg = Window.orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
      val carry = grid.withColumn("carry", max("bmax").over(wg))
        .select("bkt", "carry")
      val wi = Window.partitionBy("bkt").orderBy("arr_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      // sentinel −1 (< any real epoch) instead of nullable carries:
      // greatest() null semantics differ across engines, and a
      // Long.MinValue sentinel would overflow under `− delay`
      val marked = ev.join(carry, Seq("bkt"))
        .withColumn("wm_base", greatest(
          coalesce(max("ts_us").over(wi), lit(-1L)),
          coalesce(col("carry"), lit(-1L))))
      marked.select(col("ts_us"), col("wm_base"),
          explode(array(lit(0L), lit(1800L), lit(3600L), lit(7200L)))
            .as("delay_s"))
        .groupBy("delay_s")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("wm_base") >= 0 &&
              col("ts_us") < col("wm_base") - col("delay_s") * 1000000L, 1L)
            .otherwise(0L)).as("n_late"))
        .withColumn("late_ppm", expr("n_late * 1000000 div n_events"))
        .select("delay_s", "n_events", "n_late", "late_ppm")
        .orderBy("delay_s")
    }),

    // X219: gaps-and-islands streak detection (the MATCH_RECOGNIZE /
    // CEP shape in its relational form) — maximal runs of strictly
    // increasing consecutive order totals per customer, reported when
    // the streak reaches 3+. The standard two-window derivation: a lag
    // marks each sequence break, the running sum of breaks names the
    // island, and one aggregate per (customer, island) collapses runs
    // — no iteration, no self-join, both windows partitioned by the
    // high-cardinality customer key with per-customer frames bounded
    // by orders-per-customer (TPC-H ~10-40; a 100 TB event history
    // sessionizes the same way). Runs are keyed for deterministic
    // output by their min orderkey (globally unique → unique per run).
    // Totals in integer cents; dates surfaced as DATE for portability.
    "x194_streak_islands" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy("dt", "o_orderkey")
      val runs = Tables.orders(s, d).select(
          col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("dt"),
          (col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long").as("cents"))
        .withColumn("prev", lag("cents", 1).over(w))
        .withColumn("brk",
          when(col("prev").isNull || col("cents") <= col("prev"), 1L)
            .otherwise(0L))
        .withColumn("run_id", sum("brk").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      runs.groupBy("o_custkey", "run_id")
        .agg(min("o_orderkey").as("run_key"),
          min("dt").as("run_start"), max("dt").as("run_end"),
          count(lit(1)).as("run_len"), sum("cents").as("run_cents"))
        .filter(col("run_len") >= 3)
        .select("o_custkey", "run_key", "run_start", "run_end",
          "run_len", "run_cents")
        .orderBy("o_custkey", "run_key")
    }),

    // X220: rolling 7-day distinct customers — the "rolling DAU/WAU"
    // dashboard row that a RANGE window cannot express (COUNT(DISTINCT)
    // is not window-able) and the naive form solves with a per-day
    // range self-join (days × 7-day slices of the fact — the oracle
    // states exactly that). The scale-safe form inverts it: each
    // (day, customer) PRESENCE contributes to the 7 target days it
    // covers — one distinct-pair pass, a 7× explode of the
    // presence-grain (not event-grain) table, one (day, customer)
    // distinct count. Work is 7·|presence| regardless of how many
    // events back each presence (at 100 TB the raw fact collapses to
    // presence grain in the first map-combined distinct). Same-day
    // distincts (u1) ride the same presence table for contrast.
    "x195_rolling_distinct" -> ((s, d) => {
      val p = Tables.orders(s, d)
        .select(col("o_orderdate").cast("date").as("dt"), col("o_custkey"))
        .distinct()
      val days = p.select("dt").distinct()
      val u7 = p.withColumn("k", explode(sequence(lit(0), lit(6))))
        .select(expr("date_add(dt, k)").as("dt"), col("o_custkey"))
        .join(days, Seq("dt"), "left_semi")
        .groupBy("dt")
        .agg(countDistinct("o_custkey").as("u7_custs"))
      val u1 = p.groupBy("dt").agg(count(lit(1)).as("u1_custs"))
      u1.join(u7, Seq("dt"))
        .select("dt", "u1_custs", "u7_custs")
        .orderBy("dt")
    }))

  def k9Cutoff = lit("2001-04-01").cast("timestamp")
  private def k9Partials(l: DataFrame, o: DataFrame): DataFrame =
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("revenue"))

  /** ΔO's key boundary — the deployment's order HIGH-WATER MARK. New
    * orders take keys above it (monotone business keys — how OLTP
    * sources actually assign them; the reference's own incremental
    * extract is a fact_id high-water mark, `spark_etl.py:120-138`), so
    * the L⋈ΔO quadrant carries an `o_orderkey > hwm` constraint that
    * reaches lineitem's scan: on the orderkey-sorted bucketed layout,
    * row-group stats skip the ~95% of history below the mark. The %20
    * modulus earlier rounds used spread ΔO uniformly over the keyspace,
    * making that prune structurally impossible — the r9 verdict's
    * missing half of the IVM argument. (19·max) div 20 ⇒ top ~5% of
    * the key range is the late batch; pure integer arithmetic so both
    * engines agree exactly; one bounded 1-row collect. */
  def k9OrderHwm(s: SparkSession, d: String): Long =
    Tables.orders(s, d).agg(max("o_orderkey")).head().getLong(0) * 19L / 20L

  /** k9's heavy quadrant P(L_old ⋈ O_old) — computed once, stored as
    * the view snapshot (the bench prelude materializes it untimed; the
    * gate form inline, so the oracle hash covers the whole path). */
  def incrementalJoinSnapshot(s: SparkSession, d: String): DataFrame = {
    val hwm = k9OrderHwm(s, d)
    k9Partials(
      Tables.lineitem(s, d).filter(col("l_shipdate") < k9Cutoff),
      Tables.orders(s, d).filter(col("o_orderkey") <= hwm))
  }

  /** k9's REFRESH tail: three \|Δ\|-bounded joins folded into the
    * stored snapshot — the recurring cost of view maintenance (vs
    * q_join_view_full, the rescan it replaces; the bench times the
    * pair, with the slices drawn from the SERVICE layout: ΔL/ΔO from
    * their staged delta partitions, L_old from the bucketed table).
    * The `l_orderkey > hwm` filter on the L⋈ΔO quadrant is implied by
    * the join key but stated explicitly so it reaches the scan as a
    * static pushed predicate — constraint inference would keep it a
    * join-time residual, and the row-group skip on the sorted layout
    * is the whole point. */
  def incrementalJoinFold(snapshot: DataFrame, lOld: DataFrame,
                          lNew: DataFrame, oOld: DataFrame, oNew: DataFrame,
                          hwm: Long): DataFrame =
    snapshot
      .unionByName(k9Partials(lNew, oOld))
      .unionByName(k9Partials(lOld.filter(col("l_orderkey") > hwm), oNew))
      .unionByName(k9Partials(lNew, oNew))
      .groupBy("o_orderpriority")
      .agg(sum("n_items").as("n_items"), sum("revenue").as("rev"))
      .select(col("o_orderpriority"), col("n_items"),
        col("rev").cast("double").as("revenue"))
      .orderBy("o_orderpriority")

  /** Gate form of the refresh: every slice from the plain tables, so
    * the oracle hash covers the whole path (the bench probe feeds
    * [[incrementalJoinFold]] the service-layout slices instead —
    * K9ProbeSpec pins probe ≡ gate). */
  def incrementalJoinRefresh(s: SparkSession, d: String,
                             snapshot: DataFrame): DataFrame = {
    val hwm = k9OrderHwm(s, d)
    val li = Tables.lineitem(s, d)
    val ord = Tables.orders(s, d)
    incrementalJoinFold(snapshot,
      lOld = li.filter(col("l_shipdate") < k9Cutoff),
      lNew = li.filter(col("l_shipdate") >= k9Cutoff || col("l_shipdate").isNull),
      oOld = ord.filter(col("o_orderkey") <= hwm),
      oNew = ord.filter(col("o_orderkey") > hwm),
      hwm = hwm)
  }

  /** The bench prelude's delta staging: ΔL and ΔO written as their own
    * parquet partitions — how a real pipeline's late batch actually
    * lands (an ingest directory per batch), so the refresh's delta
    * scans are \|Δ\|-sized BY CONSTRUCTION instead of filter-scans of
    * the full history. */
  def k9StageDeltas(s: SparkSession, d: String, dir: String): Long = {
    val hwm = k9OrderHwm(s, d)
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= k9Cutoff || col("l_shipdate").isNull)
      .write.mode("overwrite").parquet(s"$dir/delta_l")
    Tables.orders(s, d).filter(col("o_orderkey") > hwm)
      .write.mode("overwrite").parquet(s"$dir/delta_o")
    hwm
  }

  /** The skewed fact: ~80% of lineitem rows re-keyed onto supplier 7
    * (`l_orderkey % 5 < 4`), the rest keep their true suppkey — a
    * planted hot key with oracle-expressible semantics (the same CASE
    * lives in the q_skew_* oracle SQL). */
  private def skewFact(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select(
      when(col("l_orderkey") % 5 < 4, lit(7L)).otherwise(col("l_suppkey"))
        .as("skew_key"),
      col("l_quantity"), col("l_extendedprice"), col("l_discount"))

  private def skewAgg(joined: DataFrame): DataFrame = joined
    .groupBy("s_nationkey")
    .agg(count(lit(1)).as("n_lines"),
      dsum(col("l_quantity")).as("sum_qty"),
      dsumExpr(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
    .orderBy("s_nationkey")

  def oracles: Map[String, String] = Map(
    // the identical three synchronous LPA sweeps, unrolled — each
    // round a join to the previous round's labels, a (node, label)
    // count, and the (count desc, min label) top-1
    "x200_lpa_communities" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
              pr AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
                     FROM op a JOIN op b
                       ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
                     GROUP BY 1, 2 HAVING count(*) >= 2),
              e AS (SELECT pa AS src, pb AS dst FROM pr
                    UNION ALL SELECT pb, pa FROM pr),
              l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM e),
              c1 AS (SELECT e.src AS node, l.lbl, count(*) AS cnt
                     FROM e JOIN l0 l ON e.dst = l.node GROUP BY 1, 2),
              l1 AS (SELECT node, lbl FROM (
                       SELECT node, lbl, row_number() OVER
                         (PARTITION BY node ORDER BY cnt DESC, lbl ASC) AS rn
                       FROM c1) WHERE rn = 1),
              c2 AS (SELECT e.src AS node, l.lbl, count(*) AS cnt
                     FROM e JOIN l1 l ON e.dst = l.node GROUP BY 1, 2),
              l2 AS (SELECT node, lbl FROM (
                       SELECT node, lbl, row_number() OVER
                         (PARTITION BY node ORDER BY cnt DESC, lbl ASC) AS rn
                       FROM c2) WHERE rn = 1),
              c3 AS (SELECT e.src AS node, l.lbl, count(*) AS cnt
                     FROM e JOIN l2 l ON e.dst = l.node GROUP BY 1, 2),
              l3 AS (SELECT node, lbl FROM (
                       SELECT node, lbl, row_number() OVER
                         (PARTITION BY node ORDER BY cnt DESC, lbl ASC) AS rn
                       FROM c3) WHERE rn = 1)
         SELECT CAST(node AS BIGINT) AS node, CAST(lbl AS BIGINT) AS lbl
         FROM l3 ORDER BY node""",

    // the window form the bounded aggregate replaces — hash equality
    // proves the Aggregator's merge is the same total order
    "x207_topk_agg" ->
      """WITH o AS (SELECT o_orderpriority, o_orderkey,
                           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
                    FROM orders),
              r AS (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                                                 ORDER BY cents DESC, o_orderkey) AS rn
                    FROM o)
         SELECT o_orderpriority, CAST(rn AS INT) AS rnk, o_orderkey, cents
         FROM r WHERE rn <= 5 ORDER BY o_orderpriority, rnk""",

    // the same row-granular watermark simulation, stated with one
    // running-max window over arrival order
    "x203_lateness_curve" ->
      """WITH e AS (SELECT event_id,
                           epoch_us(date_trunc('microseconds', ts)) AS ts_us
                    FROM events),
              a AS (SELECT event_id, ts_us,
                           ts_us + (event_id % 7200) * 1000000 AS arr_us
                    FROM e),
              m AS (SELECT ts_us,
                           COALESCE(MAX(ts_us) OVER (ORDER BY arr_us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                             AS wm_base
                    FROM a),
              x AS (SELECT ts_us, wm_base,
                           CAST(unnest([0, 1800, 3600, 7200]) AS BIGINT) AS delay_s
                    FROM m)
         SELECT CAST(delay_s AS BIGINT) AS delay_s,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(SUM(CASE WHEN wm_base >= 0
                               AND ts_us < wm_base - delay_s * 1000000
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
                CAST(SUM(CASE WHEN wm_base >= 0
                               AND ts_us < wm_base - delay_s * 1000000
                              THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
                  AS late_ppm
         FROM x GROUP BY delay_s ORDER BY delay_s""",

    // the same lag → break-sum → island aggregate, restated
    "x194_streak_islands" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
                           CAST(o_orderdate AS DATE) AS dt,
                           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
                    FROM orders),
              m AS (SELECT *, CASE WHEN lag(cents) OVER w IS NULL
                                     OR cents <= lag(cents) OVER w
                                   THEN 1 ELSE 0 END AS brk
                    FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY dt, o_orderkey)),
              r AS (SELECT *, SUM(brk) OVER (PARTITION BY o_custkey ORDER BY dt, o_orderkey
                                             ROWS UNBOUNDED PRECEDING) AS run_id
                    FROM m)
         SELECT o_custkey, CAST(MIN(o_orderkey) AS BIGINT) AS run_key,
                MIN(dt) AS run_start, MAX(dt) AS run_end,
                CAST(COUNT(*) AS BIGINT) AS run_len,
                CAST(SUM(cents) AS BIGINT) AS run_cents
         FROM r GROUP BY o_custkey, run_id
         HAVING COUNT(*) >= 3
         ORDER BY o_custkey, run_key""",

    // the naive per-day range self-join the presence-explode replaces
    "x195_rolling_distinct" ->
      """WITH p AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS dt, o_custkey
                    FROM orders),
              days AS (SELECT DISTINCT dt FROM p)
         SELECT d.dt,
                CAST((SELECT COUNT(*) FROM p p1 WHERE p1.dt = d.dt) AS BIGINT) AS u1_custs,
                CAST(COUNT(DISTINCT p.o_custkey) AS BIGINT) AS u7_custs
         FROM days d JOIN p ON p.dt BETWEEN d.dt - 6 AND d.dt
         GROUP BY d.dt ORDER BY d.dt""",

    // same exact-sums-then-double combine as the Spark side (corr()
    // built-ins are float accumulators on both engines — not used)
    "a19_corr_exact" ->
      """WITH b AS (SELECT o_orderstatus,
                CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(18,0)) AS x,
                CAST(date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS DECIMAL(18,0)) AS y
              FROM orders WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL),
           a AS (SELECT o_orderstatus, count(*) AS n,
                        SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
                        SUM(x*x) AS sxx, SUM(y*y) AS syy
                 FROM b GROUP BY o_orderstatus)
         SELECT o_orderstatus, n,
                (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
                     (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                AS corr_price_day
         FROM a ORDER BY o_orderstatus""",
    // full recompute — hash-equality against the snapshot∪delta merge
    // proves the incremental maintenance is exact
    "k8_incremental_agg" ->
      """SELECT o_custkey, count(*) AS n_orders,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders GROUP BY o_custkey ORDER BY o_custkey""",
    // the full recompute — hash-equality proves the 4-quadrant delta
    // algebra exact
    "k9_incremental_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_join_view_full" ->
      """SELECT o_orderpriority, count(*) AS n_items,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    // the OTHER END of the replication-validation protocol: DuckDB
    // canonicalizes and digests the same rows independently; matching
    // checksums ARE the operator's correctness statement
    "q_table_checksum" ->
      """SELECT l_orderkey % 16 AS bucket, count(*) AS n_rows,
                CAST(SUM(CAST(('0x' || substr(md5(
                  CAST(l_orderkey AS VARCHAR) || '|' ||
                  CAST(l_partkey AS VARCHAR) || '|' ||
                  CAST(l_suppkey AS VARCHAR) || '|' ||
                  CAST(l_linenumber AS VARCHAR) || '|' ||
                  CAST(CAST(l_quantity AS DECIMAL(18,2)) AS VARCHAR) || '|' ||
                  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) || '|' ||
                  CAST(CAST(l_discount AS DECIMAL(18,2)) AS VARCHAR) || '|' ||
                  CAST(CAST(l_tax AS DECIMAL(18,2)) AS VARCHAR) || '|' ||
                  l_returnflag || '|' || l_linestatus || '|' ||
                  strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d')), 1, 12)) AS BIGINT))
                AS VARCHAR) AS checksum
         FROM lineitem GROUP BY bucket ORDER BY bucket""",
    // naive global definition: rank every order day per customer, take
    // gap(first→second) or censor at the horizon; hazard grid from the
    // dense risk-set cumulation
    "x121_survival_hazard" ->
      """WITH days AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS day FROM orders),
          f AS (SELECT o_custkey, count(*) AS n_orders, min(day) AS t1
                FROM days GROUP BY 1),
          b AS (SELECT d.o_custkey, f.n_orders, f.t1,
                       min(CASE WHEN d.day > f.t1 THEN d.day END) AS t2_later,
                       SUM(CASE WHEN d.day = f.t1 THEN 1 ELSE 0 END) AS n_at_t1
                FROM days d JOIN f USING (o_custkey) GROUP BY 1, 2, 3),
          h AS (SELECT max(CAST(o_orderdate AS DATE)) AS hz FROM orders),
          subj AS (SELECT o_custkey,
                          CASE WHEN n_at_t1 >= 2 THEN CAST(0 AS BIGINT)
                               WHEN t2_later IS NOT NULL
                                 THEN CAST(date_diff('day', t1, t2_later) AS BIGINT)
                               ELSE CAST(date_diff('day', t1, hz) AS BIGINT) END AS t,
                          CASE WHEN n_orders >= 2 THEN CAST(1 AS BIGINT)
                               ELSE CAST(0 AS BIGINT) END AS event
                   FROM b, h),
          grid AS (SELECT t, count(*) AS n_at, CAST(SUM(event) AS BIGINT) AS d_at
                   FROM subj GROUP BY t),
          tot AS (SELECT count(*) AS n_total FROM subj),
          risk AS (SELECT t, n_at, d_at,
                          n_total - COALESCE(CAST(SUM(n_at) OVER (ORDER BY t
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                            CAST(0 AS BIGINT)) AS n_risk
                   FROM grid, tot),
          haz AS (SELECT t, n_risk, d_at, n_at,
                         d_at * 1000000000 // n_risk AS hazard_ppb
                  FROM risk WHERE d_at > 0)
          SELECT t AS t_days, n_risk, d_at AS d_events,
                 n_at - d_at AS n_censored_at, hazard_ppb,
                 CAST(SUM(hazard_ppb) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_hazard_ppb
          FROM haz ORDER BY t_days""",
    // the same half-open interval semantics stated naively
    "d6_scd2_lookup" ->
      """WITH h AS (SELECT user_id, event_type, ts AS effective_from,
                           lead(ts) OVER w AS effective_to,
                           CAST(row_number() OVER w AS INT) AS version
                    FROM events
                    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          f AS (SELECT event_id AS fact_id, user_id, ts AS fact_ts
                FROM events WHERE event_id % 5 = 0)
         SELECT f.fact_id, f.user_id, f.fact_ts,
                h.event_type AS status_asof, h.version
         FROM f JOIN h ON f.user_id = h.user_id
           AND f.fact_ts >= h.effective_from
           AND (h.effective_to IS NULL OR f.fact_ts < h.effective_to)
         ORDER BY fact_id""",
    // truth and estimator both from the key histogram — the join is
    // never executed
    "x128_join_cardinality" ->
      """WITH c AS (SELECT l_partkey, count(*) AS c FROM lineitem GROUP BY 1),
          hot AS (SELECT count(*) AS k_hot, CAST(SUM(c) AS BIGINT) AS n_hot,
                         CAST(SUM(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0)) AS hot_pairs
                  FROM (SELECT l_partkey, c FROM c ORDER BY c DESC, l_partkey LIMIT 20)),
          t AS (SELECT count(*) AS d_keys, CAST(SUM(c) AS BIGINT) AS n_rows,
                       CAST(SUM(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0)) AS actual_pairs
                FROM c),
          e AS (SELECT d_keys, n_rows, actual_pairs,
                       CAST(hot_pairs + CASE WHEN d_keys > k_hot
                         THEN ((n_rows - n_hot) * (n_rows - n_hot))
                                // (d_keys - k_hot)
                         ELSE 0 END AS DECIMAL(38,0)) AS est_pairs
                FROM t, hot)
         SELECT d_keys, n_rows,
                CAST(actual_pairs AS VARCHAR) AS actual_pairs,
                CAST(est_pairs AS VARCHAR) AS est_pairs,
                (CAST(est_pairs AS DOUBLE) - CAST(actual_pairs AS DOUBLE))
                  / CAST(actual_pairs AS DOUBLE) AS rel_err
         FROM e""",
    // the NAIVE all-pairs form (length filter only — a theorem of edit
    // distance, not a pruning heuristic): hash-equality against the
    // prefix-filtered engine plan proves the q-gram filter lossless
    "x125_edit_neardups" ->
      """WITH k AS (SELECT c_custkey AS id, lower(trim(c_name)) AS name
                    FROM customer WHERE c_custkey <= 2000)
         SELECT a.id AS id_a, b.id AS id_b, a.name AS name_a, b.name AS name_b,
                levenshtein(a.name, b.name) AS dist
         FROM k a JOIN k b ON a.id < b.id
           AND abs(length(a.name) - length(b.name)) <= 1
         WHERE levenshtein(a.name, b.name) <= 1
         ORDER BY id_a, id_b""",
    // exact overlap asserted outright; the sketch verdict bits must be
    // TRUE or the inclusion-exclusion drifted past its bound (a15
    // discipline)
    "a26_overlap_estimate" ->
      """WITH y AS (SELECT l_partkey, EXTRACT(year FROM l_shipdate) AS yr FROM lineitem
                    WHERE EXTRACT(year FROM l_shipdate) IN (1997, 1998))
         SELECT count(DISTINCT CASE WHEN yr = 1997 THEN l_partkey END) AS exact_a,
                count(DISTINCT CASE WHEN yr = 1998 THEN l_partkey END) AS exact_b,
                count(DISTINCT CASE WHEN yr = 1997 THEN l_partkey END)
                  + count(DISTINCT CASE WHEN yr = 1998 THEN l_partkey END)
                  - count(DISTINCT l_partkey) AS exact_inter,
                TRUE AS a_within_5pct, TRUE AS b_within_5pct,
                TRUE AS inter_within_10pct
         FROM y""",
    "s3_parquet_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem
         WHERE l_quantity > 25 ORDER BY l_orderkey, l_linenumber""",
    "s5_sql_scan" ->
      """SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "k5_insert_select" ->
      """SELECT c_custkey AS customer_id, c_name AS customer_name, c_nationkey AS nation_id,
                c_acctbal AS acct_balance, c_mktsegment AS segment
         FROM customer ORDER BY customer_id""",
    "p1_project_rename" ->
      """SELECT o_orderkey AS transaction_id, CAST(o_orderdate AS DATE) AS transaction_date,
                o_totalprice AS transaction_amount, o_orderpriority AS narration
         FROM orders ORDER BY transaction_id""",
    "p2_cast_rewrite" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
                CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS total_cents
         FROM orders ORDER BY o_orderkey""",
    "p3_filter_notnull" ->
      """SELECT event_id, user_id, event_type FROM events WHERE user_id IS NOT NULL ORDER BY event_id""",
    "p4_incremental_hwm" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey > 500 ORDER BY o_orderkey""",
    "p5_like" ->
      """SELECT p_partkey, p_brand, p_type FROM part
         WHERE p_brand LIKE 'Brand#1%' OR p_type LIKE '%ECO%' ORDER BY p_partkey""",
    "p6_case_when" ->
      """SELECT c_custkey,
                CASE WHEN c_acctbal < 0 THEN 'negative'
                     WHEN c_acctbal < 1000 THEN 'low'
                     WHEN c_acctbal < 5000 THEN 'mid'
                     ELSE 'high' END AS bal_bucket
         FROM customer ORDER BY c_custkey""",
    "p8_limit_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 5""",
    "j1_dim_fact_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "j2_star3_rollup" ->
      """SELECT c_mktsegment, EXTRACT(year FROM o_orderdate) AS order_year, l_returnflag,
                count(*) AS n_lines,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "j3_date_dim_join" ->
      """SELECT EXTRACT(year FROM o_orderdate) AS year, EXTRACT(month FROM o_orderdate) AS month,
                monthname(o_orderdate) AS month_name, count(*) AS n_orders,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders GROUP BY 1, 2, 3 ORDER BY 1, 2""",
    "j4_anti_orphans" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "j4b_orphans_planted" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_custkey % 3 <> 0)
         ORDER BY c_custkey""",
    "j9_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
                CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                       JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-06-01'
           AND l_shipdate > TIMESTAMP '1998-06-01'
         GROUP BY 1, 2, 3 ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "a20_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
                CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS avg_qty,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
                CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(l_discount) AS avg_disc,
                count(*) AS n_rows
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "j10_local_supplier_volume" ->
      """SELECT n_name,
                CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY 1 ORDER BY revenue DESC, n_name""",
    "a21_event_funnel" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
                            date_trunc('microseconds', ts) AS ts FROM events),
         s1 AS (SELECT *, MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS seen_view FROM ev),
         s2 AS (SELECT *, CASE WHEN event_type = 'click' AND seen_view = 1
                               THEN 1 ELSE 0 END AS click_ok FROM s1),
         s3 AS (SELECT *, MAX(click_ok)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS seen_click FROM s2),
         s4 AS (SELECT *, CASE WHEN event_type = 'purchase' AND seen_click = 1
                               THEN 1 ELSE 0 END AS purchase_ok FROM s3),
         pu AS (SELECT user_id,
                       MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS u_view,
                       MAX(click_ok) AS u_click, MAX(purchase_ok) AS u_purchase
                FROM s4 GROUP BY 1)
         SELECT CAST(SUM(u_view) AS BIGINT) AS n_view,
                CAST(SUM(u_click) AS BIGINT) AS n_click_after_view,
                CAST(SUM(u_purchase) AS BIGINT) AS n_purchase_after_click
         FROM pu""",
    // quantile_cont bounds restated outright; clamp + exact-decimal
    // means must reproduce the two-phase path bit-for-bit
    "x94_robust_mean" ->
      """WITH q AS (SELECT quantile_cont(l_extendedprice, 0.05) AS p05,
                           quantile_cont(l_extendedprice, 0.95) AS p95
                    FROM lineitem)
         SELECT count(*) AS n,
                CAST(SUM(CASE WHEN l_extendedprice < q.p05
                               OR l_extendedprice > q.p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped,
                q.p05 AS p05, q.p95 AS p95,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS raw_mean,
                CAST(SUM(CAST(greatest(least(l_extendedprice, q.p95), q.p05)
                              AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS winsorized_mean
         FROM lineitem, q GROUP BY q.p05, q.p95""",
    "x95_convert_latency" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
                            date_trunc('microseconds', ts) AS ts FROM events),
          st AS (SELECT *, MAX(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS last_view_ts FROM ev),
          c AS (SELECT CAST(floor(epoch(ts)) AS BIGINT)
                       - CAST(floor(epoch(last_view_ts)) AS BIGINT) AS lat_sec
                FROM st
                WHERE event_type = 'purchase' AND last_view_ts IS NOT NULL
                  AND ts <= last_view_ts + INTERVAL 1 HOUR),
          b AS (SELECT CASE WHEN lat_sec <= 0 THEN -1
                            ELSE CAST(length(bin(lat_sec)) - 1 AS INT)
                       END AS log2_bucket FROM c)
         SELECT log2_bucket, count(*) AS n_conversions
         FROM b GROUP BY 1 ORDER BY 1""",
    "x93_lateness_profile" ->
      """WITH ev AS (SELECT event_id, user_id,
                            date_trunc('microseconds', ts) AS ts,
                            md5(CAST(event_id AS VARCHAR)) AS sk FROM events),
          h AS (SELECT *, max(ts) OVER (PARTITION BY user_id ORDER BY sk
                  ROWS UNBOUNDED PRECEDING) AS hwm FROM ev),
          l AS (SELECT CAST(floor(epoch(hwm)) AS BIGINT)
                       - CAST(floor(epoch(ts)) AS BIGINT) AS late_sec FROM h),
          b AS (SELECT CASE WHEN late_sec <= 0 THEN -1
                            ELSE CAST(length(bin(late_sec)) - 1 AS INT)
                       END AS log2_bucket FROM l)
         SELECT log2_bucket, count(*) AS n_events
         FROM b GROUP BY 1 ORDER BY 1""",
    "x92_spend_trend" ->
      """WITH m AS (SELECT o_custkey,
                           CAST(EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS x,
                           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS y
                    FROM orders
                    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                      AND o_orderdate < TIMESTAMP '1998-01-01'
                    GROUP BY 1, 2),
          g AS (SELECT o_custkey, count(*) AS n_months,
                       CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                       CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
                FROM m GROUP BY 1)
         SELECT o_custkey, n_months,
                CAST(n_months * sxy - sx * sy AS DOUBLE)
                  / CAST(n_months * sxx - sx * sx AS DOUBLE) AS slope_cents,
                CAST(CAST(n_months * sxy - sx * sy AS DOUBLE)
                  / CAST(n_months * sxx - sx * sx AS DOUBLE) < 0.0 AS INT) AS declining
         FROM g WHERE n_months >= 2 ORDER BY o_custkey""",
    "x90_timed_conversion" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
                            date_trunc('microseconds', ts) AS ts FROM events),
          st AS (SELECT *, MAX(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS last_view_ts FROM ev),
          c AS (SELECT user_id,
                       CASE WHEN event_type = 'purchase' AND last_view_ts IS NOT NULL
                                 AND ts <= last_view_ts + INTERVAL 1 HOUR
                            THEN 1 ELSE 0 END AS conv
                FROM st)
         SELECT count(*) AS n_events,
                CAST(SUM(conv) AS BIGINT) AS n_conversions,
                count(DISTINCT CASE WHEN conv = 1 THEN user_id END) AS n_converting_users
         FROM c""",
    // the gap rule restated verbatim: lag + running sum + two group-bys
    "x98_sessionize" ->
      """WITH ev AS (SELECT event_id, user_id,
                            date_trunc('microseconds', ts) AS ts FROM events),
          g AS (SELECT *, lag(ts) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS prev_ts FROM ev),
          ns AS (SELECT *, CASE WHEN prev_ts IS NULL
                                  OR ts > prev_ts + INTERVAL 30 MINUTES
                                THEN 1 ELSE 0 END AS new_sess FROM g),
          sid AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess_id
                  FROM ns),
          per AS (SELECT user_id, sess_id, count(*) AS events_per_session
                  FROM sid GROUP BY 1, 2)
         SELECT events_per_session, count(*) AS n_sessions
         FROM per GROUP BY 1 ORDER BY 1""",
    // the same gap distribution × the same candidate grid; a session
    // boundary IS a gap exceeding g
    "x186_session_gaps" ->
      """WITH ev AS (SELECT event_id, user_id,
                            date_trunc('microseconds', ts) AS ts FROM events),
              g AS (SELECT epoch_us(ts) - epoch_us(lag(ts) OVER (
                      PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
                    FROM ev),
              x AS (SELECT CAST(gap_min AS BIGINT) AS gap_min, gap_us
                    FROM g, (SELECT unnest([5, 15, 30, 60, 120]) AS gap_min))
         SELECT gap_min,
                CAST(SUM(CASE WHEN gap_us IS NULL
                               OR gap_us > gap_min * 60000000 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_sessions,
                CAST(count(*) AS BIGINT) AS n_events,
                CAST(count(*) * 1000000 //
                     SUM(CASE WHEN gap_us IS NULL
                               OR gap_us > gap_min * 60000000 THEN 1 ELSE 0 END)
                     AS BIGINT) AS events_per_session_ppm
         FROM x GROUP BY gap_min ORDER BY gap_min""",

    // pair counts + ppm row-normalization over the bounded matrix
    "x99_transition_matrix" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
                            date_trunc('microseconds', ts) AS ts FROM events),
          nx AS (SELECT event_type AS from_type,
                        lead(event_type) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS to_type FROM ev),
          pc AS (SELECT from_type, to_type, count(*) AS n_pairs
                 FROM nx WHERE to_type IS NOT NULL GROUP BY 1, 2)
         SELECT from_type, to_type, n_pairs,
                CAST(n_pairs * 1000000 //
                  SUM(n_pairs) OVER (PARTITION BY from_type) AS BIGINT) AS p_ppm
         FROM pc ORDER BY from_type, to_type""",
    // the 3-sigma test in the multiplied-through integer form
    // same milli quantization, quantile_cont medians (the
    // GroupedQuantiles ≡ quantile_cont contract), dow aligned +1
    "x177_seasonal_anomaly" ->
      """WITH e AS (SELECT CAST(CAST(value AS DECIMAL(18,3)) * 1000 AS BIGINT) AS vm,
                           dayofweek(ts) + 1 AS dow, hour(ts) AS hour
                    FROM events),
          c AS (SELECT *, dow * 100 + hour AS cell FROM e),
          med AS (SELECT cell, quantile_cont(vm, 0.5) AS med FROM c GROUP BY cell),
          r AS (SELECT c.cell, c.dow, c.hour,
                       abs(CAST(c.vm AS DOUBLE) - med.med) AS resid, med.med
                FROM c JOIN med USING (cell)),
          mad AS (SELECT cell, quantile_cont(resid, 0.5) AS mad FROM r GROUP BY cell)
         SELECT r.dow, r.hour, CAST(count(*) AS BIGINT) AS n,
                MAX(r.med) AS baseline_med_milli, MAX(mad.mad) AS mad_milli,
                CAST(SUM(CASE WHEN r.resid > mad.mad * 3.0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_anomalies
         FROM r JOIN mad USING (cell)
         GROUP BY r.dow, r.hour ORDER BY r.dow, r.hour""",

    "x100_rolling_anomaly" ->
      """WITH daily AS (SELECT event_type,
                               CAST(date_trunc('microseconds', ts) AS DATE) AS day,
                               count(*) AS n_events
                        FROM events GROUP BY 1, 2),
          w AS (SELECT *,
                       row_number() OVER tw AS rn,
                       count(*) OVER t7 AS wn,
                       CAST(SUM(n_events) OVER t7 AS BIGINT) AS ws,
                       CAST(SUM(n_events * n_events) OVER t7 AS BIGINT) AS wq
                FROM daily
                WINDOW tw AS (PARTITION BY event_type ORDER BY day),
                       t7 AS (PARTITION BY event_type ORDER BY day
                              ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
         SELECT event_type, day, n_events, ws AS win_sum,
                CAST((wn * n_events - ws) * (wn * n_events - ws)
                     > (wn * wq - ws * ws) * 9 AS INT) AS anomaly
         FROM w WHERE rn >= 8 ORDER BY event_type, day""",
    // the NAIVE global-sort Pareto definition — banded must equal it
    "x110_abc_classes" ->
      """WITH pv AS (SELECT l_partkey,
                            CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_c
                     FROM lineitem GROUP BY 1),
          t AS (SELECT CAST(SUM(rev_c) AS BIGINT) AS total_c FROM pv),
          c AS (SELECT rev_c,
                       CAST(COALESCE(SUM(rev_c) OVER (ORDER BY rev_c DESC, l_partkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
                FROM pv),
          k AS (SELECT rev_c, total_c,
                       CASE WHEN cum_before * 100 < total_c * 80 THEN 'A'
                            WHEN cum_before * 100 < total_c * 95 THEN 'B'
                            ELSE 'C' END AS abc_class
                FROM c, t)
         SELECT abc_class, count(*) AS n_parts,
                CAST(SUM(rev_c) AS BIGINT) AS class_rev_c,
                CAST(SUM(rev_c) * 1000000 // total_c AS BIGINT) AS share_ppm
         FROM k GROUP BY abc_class, total_c ORDER BY abc_class""",
    // the NAIVE lag-over-global-sort islands — two-phase must equal it
    "x111_id_gaps" ->
      """WITH ids AS (SELECT DISTINCT l_orderkey FROM lineitem),
          l AS (SELECT l_orderkey,
                       lead(l_orderkey) OVER (ORDER BY l_orderkey) AS nxt
                FROM ids)
         SELECT l_orderkey + 1 AS gap_start, nxt - 1 AS gap_end,
                nxt - l_orderkey - 1 AS gap_len
         FROM l WHERE nxt > l_orderkey + 1 ORDER BY gap_start""",
    // the oracle states the SEMANTIC quintile — global rank then
    // (rn−1)·5 div n — so the hash gate proves TopFrac.tiles ≡ the
    // naive global-sort ntile on all three axes at once
    "x112_rfm_segments" ->
      """WITH g AS (SELECT o_custkey AS custkey,
                           MAX(CAST(o_orderdate AS DATE)) AS last_day,
                           count(*) AS n_orders,
                           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS spend_c
                    FROM orders GROUP BY 1),
          a AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS anchor_day FROM orders),
          b AS (SELECT g.*, 1000000 - datediff('day', last_day, anchor_day) AS rec_score FROM g, a),
          r AS (SELECT custkey,
                       CAST((row_number() OVER (ORDER BY rec_score DESC, custkey) - 1) * 5
                            // count(*) OVER () AS INT) AS r_tile,
                       CAST((row_number() OVER (ORDER BY n_orders DESC, custkey) - 1) * 5
                            // count(*) OVER () AS INT) AS f_tile,
                       CAST((row_number() OVER (ORDER BY spend_c DESC, custkey) - 1) * 5
                            // count(*) OVER () AS INT) AS m_tile
                FROM b)
         SELECT custkey, r_tile, f_tile, m_tile,
                CASE WHEN r_tile <= 1 AND f_tile <= 1 AND m_tile <= 1 THEN 'champion'
                     WHEN r_tile <= 1 AND f_tile >= 3 THEN 'new'
                     WHEN r_tile >= 3 AND f_tile <= 1 THEN 'at_risk'
                     WHEN r_tile >= 3 AND f_tile >= 3 THEN 'hibernating'
                     ELSE 'regular' END AS segment
         FROM r ORDER BY custkey""",
    "j30_reorder_gap" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
                           CAST(o_orderdate AS DATE) AS day FROM orders),
          l AS (SELECT o_custkey,
                       datediff('day',
                         lag(day) OVER (PARTITION BY o_custkey
                           ORDER BY day, o_orderkey), day) AS gap_days
                FROM o),
          g AS (SELECT o_custkey, count(*) AS n_gaps,
                       CAST(SUM(gap_days) AS BIGINT) AS sum_gap
                FROM l WHERE gap_days IS NOT NULL GROUP BY 1)
         SELECT c_mktsegment AS mktsegment, count(*) AS n_customers,
                CAST(SUM(n_gaps) AS BIGINT) AS n_gaps,
                CAST(SUM(sum_gap) AS BIGINT) AS sum_gap_days,
                CAST(SUM(sum_gap) AS DOUBLE) / CAST(SUM(n_gaps) AS DOUBLE) AS mean_gap_days
         FROM g JOIN customer ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY mktsegment""",
    // the NAIVE per-segment sort rank — banded ranks must equal it;
    // Σ rank·spend is tie-invariant so no tie rule is needed
    "x118_gini" ->
      """WITH cv AS (SELECT o_custkey,
                            CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS spend_c
                     FROM orders GROUP BY 1),
          j AS (SELECT c_mktsegment AS seg, spend_c, o_custkey
                FROM cv JOIN customer ON o_custkey = c_custkey),
          r AS (SELECT seg, spend_c,
                       row_number() OVER (PARTITION BY seg
                         ORDER BY spend_c, o_custkey) AS rk FROM j),
          a AS (SELECT seg, count(*) AS n_customers,
                       SUM(CAST(spend_c AS DECIMAL(38,0))) AS sx,
                       SUM(CAST(rk AS DECIMAL(19,0)) * CAST(spend_c AS DECIMAL(19,0))) AS srx
                FROM r GROUP BY 1)
         SELECT seg, n_customers, CAST(sx AS BIGINT) AS spend_total_c,
                (2 * CAST(srx AS DOUBLE) - CAST(n_customers + 1 AS DOUBLE) * CAST(sx AS DOUBLE))
                  / (CAST(n_customers AS DOUBLE) * CAST(sx AS DOUBLE)) AS gini
         FROM a ORDER BY seg""",
    // the mirrored RANGE frames restated on the same micros axis
    "x116_attribution" ->
      """WITH e AS (SELECT user_id, event_type,
                           date_trunc('microseconds', ts) AS ts,
                           CAST(round(value * 100) AS BIGINT) AS vc,
                           epoch_us(date_trunc('microseconds', ts)) AS us
                    FROM events),
          t AS (SELECT *, SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY us
                        RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_touch
                FROM e),
          sh AS (SELECT *, CASE WHEN event_type = 'purchase' AND n_touch > 0
                                THEN vc * 1000000 // n_touch END AS share_uc
                 FROM t),
          er AS (SELECT *, SUM(share_uc)
                  OVER (PARTITION BY user_id ORDER BY us
                        RANGE BETWEEN CURRENT ROW AND 3600000000 FOLLOWING) AS earned_uc
                 FROM sh)
         SELECT CAST(hour(ts) AS INT) AS view_hour,
                count(*) AS n_credited_views,
                CAST(SUM(earned_uc) AS BIGINT) AS credit_microcents
         FROM er WHERE event_type = 'view' AND earned_uc IS NOT NULL
         GROUP BY 1 ORDER BY view_hour""",
    // DuckDB's median IS quantile_cont(0.5) — the oracle states the
    // naive per-group median twice, so the hash gate proves the
    // histogram refinement ≡ the sort-based definition
    "x115_mad_spread" ->
      """WITH e AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc FROM events),
          m AS (SELECT event_type, count(*) AS n_obs, median(vc) AS med FROM e GROUP BY 1),
          dv AS (SELECT e.event_type, abs(e.vc * 2 - CAST(m.med * 2 AS BIGINT)) AS dev2
                 FROM e JOIN m USING (event_type)),
          md AS (SELECT event_type, median(dev2) AS mdev2 FROM dv GROUP BY 1)
         SELECT m.event_type, m.n_obs, CAST(m.med AS DOUBLE) AS median_cents,
                CAST(md.mdev2 AS DOUBLE) / 2.0 AS mad_cents
         FROM m JOIN md USING (event_type) ORDER BY event_type""",
    // the identical IEEE op order: slope, then intercept from the
    // slope, then R² from the three centered moments
    "x114_regr_trend" ->
      """WITH daily AS (SELECT event_type,
                               CAST(date_trunc('microseconds', ts) AS DATE) AS day,
                               SUM(CAST(round(value * 100) AS DECIMAL(18,0))) AS yv
                        FROM events GROUP BY 1, 2),
          a AS (SELECT MIN(day) AS day0 FROM daily),
          b AS (SELECT event_type,
                       CAST(datediff('day', day0, day) AS DECIMAL(18,0)) AS xv, yv
                FROM daily, a),
          m AS (SELECT event_type, count(*) AS n_days,
                       SUM(xv) AS sx, SUM(yv) AS sy, SUM(xv*yv) AS sxy,
                       SUM(xv*xv) AS sxx, SUM(yv*yv) AS syy
                FROM b GROUP BY 1),
          c AS (SELECT *,
                       CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cnum,
                       CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS cdenx,
                       CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS cdeny
                FROM m),
          sl AS (SELECT *, cnum / cdenx AS slope_c_per_day FROM c)
         SELECT event_type, n_days, slope_c_per_day,
                (CAST(sy AS DOUBLE) - slope_c_per_day * CAST(sx AS DOUBLE)) / CAST(n_days AS DOUBLE) AS intercept_c,
                (cnum * cnum) / (cdenx * cdeny) AS r2
         FROM sl ORDER BY event_type""",
    // ties to the smallest value — the rule both engines compute, not
    // an engine's unspecified mode()
    "a25_mode" ->
      """WITH cnt AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS ym,
                             o_orderpriority, count(*) AS n
                      FROM orders GROUP BY 1, 2),
          mx AS (SELECT ym, MAX(n) AS n_orders FROM cnt GROUP BY 1)
         SELECT ym, MIN(o_orderpriority) AS mode_priority, n_orders
         FROM cnt JOIN mx USING (ym) WHERE n = n_orders
         GROUP BY ym, n_orders ORDER BY ym""",
    // the 7-day cover explode re-stated on the (user, day) grain
    "x108_active_users" ->
      """WITH ud AS (SELECT DISTINCT user_id,
                            CAST(date_trunc('microseconds', ts) AS DATE) AS day
                     FROM events),
          dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
          cov AS (SELECT DISTINCT user_id, day + CAST(i AS INT) AS day
                  FROM ud, (SELECT unnest(generate_series(0, 6)) AS i)),
          wau AS (SELECT day, count(*) AS wau FROM cov GROUP BY 1)
         SELECT day, dau, wau,
                CAST(dau * 1000000 // wau AS BIGINT) AS stickiness_ppm
         FROM dau JOIN wau USING (day) ORDER BY day""",
    // ordered string_agg over the first five ranks
    "x109_top_paths" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
                            date_trunc('microseconds', ts) AS ts FROM events),
          r AS (SELECT user_id, event_type,
                       row_number() OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS rn FROM ev),
          f AS (SELECT user_id, count(*) AS n_ev,
                       string_agg(event_type, '>' ORDER BY rn) AS path
                FROM r WHERE rn <= 5 GROUP BY 1)
         SELECT path, count(*) AS n_users
         FROM f WHERE n_ev = 5
         GROUP BY 1 ORDER BY n_users DESC, path LIMIT 20""",
    // the closed form restated: cum − running min of cum
    "x105_cusum_shift" ->
      """WITH daily AS (SELECT event_type,
                               CAST(date_trunc('microseconds', ts) AS DATE) AS day,
                               count(*) AS n_events
                        FROM events GROUP BY 1, 2),
          k AS (SELECT *, CAST(SUM(n_events) OVER (PARTITION BY event_type) AS BIGINT)
                          // CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS k
                FROM daily),
          c AS (SELECT *, SUM(n_events - k) OVER (PARTITION BY event_type
                  ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum FROM k),
          s AS (SELECT *, cum - MIN(cum) OVER (PARTITION BY event_type
                  ORDER BY day ROWS UNBOUNDED PRECEDING) AS cusum FROM c)
         SELECT event_type, day, n_events,
                CAST(cusum AS BIGINT) AS cusum,
                CAST(cusum > k * 2 AS INT) AS shifted
         FROM s ORDER BY event_type, day""",
    // pair support over the deduped (order, part) grain
    "x106_basket_pairs" ->
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
         SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                count(*) AS support
         FROM op a JOIN op b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         GROUP BY 1, 2 ORDER BY support DESC, part_a, part_b LIMIT 20""",
    // per-user bitmask, mask histogram, literal pair grid
    "x107_audience_overlap" ->
      """WITH m AS (SELECT user_id,
                           bit_or(CAST(1 AS BIGINT) << (CASE event_type
                             WHEN 'view' THEN 0 WHEN 'click' THEN 1
                             WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3
                             ELSE 4 END)) AS mask
                    FROM events GROUP BY 1),
          h AS (SELECT mask, count(*) AS n_users FROM m GROUP BY 1),
          t(type_name, bit) AS (VALUES ('view', 0), ('click', 1),
            ('purchase', 2), ('signup', 3), ('error', 4)),
          g AS (SELECT a.type_name AS type_a, a.bit AS bit_a,
                       b.type_name AS type_b, b.bit AS bit_b
                FROM t a, t b WHERE a.bit <= b.bit)
         SELECT type_a, type_b, CAST(SUM(n_users) AS BIGINT) AS n_users
         FROM h JOIN g ON ((mask >> bit_a) & 1) = 1
                      AND ((mask >> bit_b) & 1) = 1
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // first/last by the same padded order key; arg_min/arg_max
    "x104_ohlc_bars" ->
      """WITH ev AS (SELECT event_id, event_type,
                            date_trunc('microseconds', ts) AS ts,
                            CAST(round(value * 100) AS BIGINT) AS vc FROM events),
          k AS (SELECT event_type, vc,
                       epoch_us(ts) // 900000000 AS bar,
                       lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                         || lpad(CAST(event_id AS VARCHAR), 12, '0') AS okey
                FROM ev)
         SELECT event_type,
                make_timestamp(bar * 900000000) AS bar_start,
                arg_min(vc, okey) AS open_c,
                MAX(vc) AS high_c, MIN(vc) AS low_c,
                arg_max(vc, okey) AS close_c,
                count(*) AS n_ticks
         FROM k GROUP BY event_type, bar
         ORDER BY event_type, bar_start""",
    // interval weights in exact micros; cents; one terminal division
    "x102_twap" ->
      """WITH ev AS (SELECT event_id, user_id,
                            date_trunc('microseconds', ts) AS ts,
                            CAST(round(value * 100) AS BIGINT) AS vc FROM events),
          l AS (SELECT user_id, vc, epoch_us(ts) AS us,
                       lead(epoch_us(ts)) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS next_us FROM ev),
          iv AS (SELECT user_id, vc, next_us - us AS dt_us
                 FROM l WHERE next_us IS NOT NULL)
         SELECT user_id, count(*) AS n_intervals,
                CAST(SUM(vc * dt_us) AS DOUBLE)
                  / CAST(SUM(dt_us) AS DOUBLE) AS twap_cents
         FROM iv GROUP BY 1 ORDER BY user_id""",
    // same md5 arm split as x22's bucket; chi-square restated with the
    // identical fixed-order IEEE expression over the exact cells
    "x103_ab_lift" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
                            date_trunc('microseconds', ts) AS ts FROM events),
          st AS (SELECT *, MAX(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS last_view_ts FROM ev),
          u AS (SELECT user_id,
                       MAX(CASE WHEN event_type = 'purchase' AND last_view_ts IS NOT NULL
                                     AND ts <= last_view_ts + INTERVAL 1 HOUR
                                THEN 1 ELSE 0 END) AS converted
                FROM st GROUP BY 1),
          arm AS (SELECT converted,
                         ((strpos('0123456789abcdef', substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) * 16
                          + (strpos('0123456789abcdef', substring(md5(CAST(user_id AS VARCHAR)), 2, 1)) - 1)) % 2 AS arm
                  FROM u),
          c AS (SELECT
                  CAST(SUM(CASE WHEN arm = 0 AND converted = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a_conv,
                  CAST(SUM(CASE WHEN arm = 0 AND converted = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a_no,
                  CAST(SUM(CASE WHEN arm = 1 AND converted = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b_conv,
                  CAST(SUM(CASE WHEN arm = 1 AND converted = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b_no
                FROM arm)
         SELECT a_conv, a_no, b_conv, b_no,
                CAST(a_conv * 1000000 // (a_conv + a_no) AS BIGINT) AS a_ppm,
                CAST(b_conv * 1000000 // (b_conv + b_no) AS BIGINT) AS b_ppm,
                CAST(b_conv * 1000000 // (b_conv + b_no) AS BIGINT)
                  - CAST(a_conv * 1000000 // (a_conv + a_no) AS BIGINT) AS lift_ppm,
                CAST(a_conv + a_no + b_conv + b_no AS DOUBLE)
                  * CAST(a_conv * b_no - a_no * b_conv AS DOUBLE)
                  * CAST(a_conv * b_no - a_no * b_conv AS DOUBLE)
                  / (CAST(a_conv + a_no AS DOUBLE) * CAST(b_conv + b_no AS DOUBLE)
                     * CAST(a_conv + b_conv AS DOUBLE) * CAST(a_no + b_no AS DOUBLE)) AS chi2
         FROM c""",
    "a22_cohort_retention" ->
      """WITH act AS (SELECT DISTINCT user_id,
                             CAST(date_trunc('week', date_trunc('microseconds', ts)) AS DATE) AS activity_week
                      FROM events),
         wc AS (SELECT activity_week,
                       MIN(activity_week) OVER (PARTITION BY user_id) AS cohort_week
                FROM act)
         SELECT cohort_week,
                CAST(datediff('day', cohort_week, activity_week) / 7 AS INT) AS week_offset,
                count(*) AS n_users
         FROM wc
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "j11_big_customer" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
         FROM orders
         JOIN (SELECT l_orderkey,
                      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
               FROM lineitem GROUP BY 1
               HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 250.0)
           ON o_orderkey = l_orderkey
         JOIN customer ON o_custkey = c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    "j12_small_qty_revenue" ->
      """WITH f AS (SELECT l_extendedprice,
                           CAST(round(l_quantity * 100) AS BIGINT) AS qc,
                           SUM(CAST(round(l_quantity * 100) AS BIGINT))
                             OVER (PARTITION BY l_partkey) AS sqc,
                           COUNT(*) OVER (PARTITION BY l_partkey) AS cnt
                    FROM lineitem JOIN part ON p_partkey = l_partkey
                    WHERE p_brand = 'Brand#23')
         SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_qty_revenue,
                count(*) AS n_lines
         FROM f WHERE 5 * qc * cnt < sqc""",
    "j15_sales_opportunity" ->
      """WITH thr AS (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                             / COUNT(c_acctbal) AS thr
                      FROM customer WHERE c_acctbal > 0)
         SELECT c_mktsegment, count(*) AS numcust,
                CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
         FROM customer CROSS JOIN thr
         WHERE c_acctbal > thr
           AND NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderdate >= TIMESTAMP '2000-01-01')
         GROUP BY 1 ORDER BY 1""",
    "j16_disjunctive_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
                count(*) AS n_lines
         FROM lineitem JOIN part ON p_partkey = l_partkey
         WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
            OR (p_brand = 'Brand#4' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
            OR (p_brand = 'Brand#19' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)""",
    "j13_priority_check" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders o
         WHERE o_orderdate >= TIMESTAMP '1997-07-01'
           AND o_orderdate < TIMESTAMP '1997-10-01'
           AND EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey
                         AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
         GROUP BY 1 ORDER BY 1""",
    "j14_waiting_supplier" ->
      """SELECT s_name, count(*) AS numwait
         FROM lineitem l1
         JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
         JOIN supplier ON s_suppkey = l1.l_suppkey
         WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
         GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""",
    "a1_kpi_global" ->
      """SELECT max(o_orderkey) AS max_key, count(*) AS n_rows, count(DISTINCT o_custkey) AS n_cust,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
                min(o_totalprice) AS min_total, max(o_totalprice) AS max_total
         FROM orders""",
    "a6_sum_avg_by_seg" ->
      """SELECT c_mktsegment, count(*) AS n,
                CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(c_acctbal) AS avg_bal
         FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "a8_topk_by_measure" ->
      """SELECT event_type, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM events GROUP BY event_type ORDER BY total DESC, event_type LIMIT 3""",
    "a10_year_slice" ->
      """SELECT o_orderstatus, count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "a12_cube_slicer" ->
      """SELECT o_orderstatus, EXTRACT(year FROM o_orderdate) AS order_year, count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders GROUP BY CUBE(o_orderstatus, EXTRACT(year FROM o_orderdate))
         ORDER BY o_orderstatus ASC NULLS FIRST, order_year ASC NULLS FIRST""",
    "d1_dedup_full" ->
      """SELECT DISTINCT l_suppkey, l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_suppkey, l_returnflag, l_linestatus""",
    "d2_dedup_lww" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_type,
                date_trunc('second', ts) AS last_ts
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY date_trunc('microseconds', ts) DESC, event_id DESC) AS rn
               FROM events) WHERE rn = 1 ORDER BY user_id""",
    "w1_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
                row_number() OVER w AS rn,
                lag(o_totalprice, 1) OVER w AS prev_price,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                     OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
         FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, rn""",
    "f_numeric_clean" ->
      """SELECT o_orderkey,
                CAST(NULLIF(regexp_extract(o_orderpriority, '^\s*(\d+)', 1), '') AS INT) AS priority_num,
                COALESCE(CAST(o_totalprice AS DOUBLE), 0.0) AS total_filled,
                ABS(o_totalprice - 100000.0) AS delta_abs
         FROM orders ORDER BY o_orderkey""",
    "f_sentinel_fill" ->
      """SELECT doc_id, COALESCE(NULLIF(source, 'src0'), 'unknown') AS src_clean
         FROM documents ORDER BY doc_id""",
    "f_date_dim" ->
      """WITH dd AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS date_full FROM orders WHERE o_orderdate IS NOT NULL)
         SELECT CAST(EXTRACT(year FROM date_full)*10000 + EXTRACT(month FROM date_full)*100
                     + EXTRACT(day FROM date_full) AS INT) AS date_id,
                date_full,
                CAST(EXTRACT(year FROM date_full) AS INT) AS year,
                CAST(EXTRACT(quarter FROM date_full) AS INT) AS quarter,
                CAST(EXTRACT(month FROM date_full) AS INT) AS month,
                CAST(EXTRACT(week FROM date_full) AS INT) AS week,
                CAST(EXTRACT(day FROM date_full) AS INT) AS day,
                CAST(EXTRACT(dow FROM date_full) AS INT) AS day_of_week,
                dayname(date_full) AS day_name,
                monthname(date_full) AS month_name,
                CASE WHEN EXTRACT(dow FROM date_full) IN (0, 6) THEN 0 ELSE 1 END AS is_weekday,
                CASE WHEN (EXTRACT(year FROM date_full) % 4 = 0 AND EXTRACT(year FROM date_full) % 100 <> 0)
                          OR EXTRACT(year FROM date_full) % 400 = 0 THEN 1 ELSE 0 END AS is_leapyear
         FROM dd ORDER BY date_id""",
    "f21_surrogate_keys" ->
      """SELECT c_custkey, 1000 + row_number() OVER (ORDER BY c_custkey) AS fact_id
         FROM customer ORDER BY c_custkey""",
    "p9_set_ops" ->
      """WITH y97 AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997),
              y98 AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1998)
         SELECT custkey, 'both' AS set_op FROM (SELECT custkey FROM y97 INTERSECT SELECT custkey FROM y98)
         UNION ALL
         SELECT custkey, 'only_1997' AS set_op FROM (SELECT custkey FROM y97 EXCEPT SELECT custkey FROM y98)
         ORDER BY set_op, custkey""",
    "a13_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",
    "a14_grouping_sets" ->
      """SELECT o_orderstatus, EXTRACT(year FROM o_orderdate) AS order_year, count(*) AS n
         FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (EXTRACT(year FROM o_orderdate)))
         ORDER BY o_orderstatus ASC NULLS FIRST, order_year ASC NULLS FIRST""",
    "j5_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
         ORDER BY c_custkey""",
    "j6_range_join" ->
      """WITH buckets(bucket_id, lo, hi) AS (VALUES
           (1, -1e18, 100.0), (2, 100.0, 500.0), (3, 500.0, 2000.0), (4, 2000.0, 1e18))
         SELECT bucket_id, count(*) AS n,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM events JOIN buckets ON value >= lo AND value < hi
         GROUP BY bucket_id ORDER BY bucket_id""",
    "w2_window_range" ->
      """SELECT o_custkey, o_orderkey, day_num,
                count(*) OVER w AS n_last30,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_last30
         FROM (SELECT *, date_diff('day', DATE '1990-01-01', o_orderdate) AS day_num FROM orders)
         WINDOW w AS (PARTITION BY o_custkey ORDER BY day_num RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
         ORDER BY o_custkey, o_orderkey""",
    "k6_pipeline_fact" ->
      """SELECT row_number() OVER (ORDER BY o_orderkey) AS fact_id,
                o_orderkey AS source_order_key,
                o_custkey AS customer_id,
                CAST(strftime(CAST(o_orderdate AS DATE), '%Y%m%d') AS INT) AS date_id,
                ABS(COALESCE(CAST(o_totalprice AS DOUBLE), 0.0)) AS amount,
                CAST(NULLIF(regexp_extract(o_orderpriority, '^\s*(\d+)', 1), '') AS INT) AS priority_num,
                CASE WHEN length(trim(o_orderstatus)) = 0 THEN NULL ELSE o_orderstatus END AS status,
                CAST(EXTRACT(year FROM o_orderdate) AS INT) AS load_year
         FROM orders WHERE o_orderkey IS NOT NULL
         ORDER BY source_order_key""",
    "a16_pivot" ->
      """SELECT o_orderstatus,
                CAST(COALESCE(SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1996 THEN 1 END), 0) AS BIGINT) AS y1996,
                CAST(COALESCE(SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1997 THEN 1 END), 0) AS BIGINT) AS y1997,
                CAST(COALESCE(SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1998 THEN 1 END), 0) AS BIGINT) AS y1998
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    // join-based lag on the month grain; deltas fixed-order IEEE
    "a24_period_over_period" ->
      """WITH m AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_c
                    FROM orders GROUP BY 1)
         SELECT m.month, m.rev_c,
                CAST(m.rev_c AS DOUBLE) * 1000000.0 / CAST(p.rev_c AS DOUBLE)
                  - 1000000.0 AS mom_delta_ppm,
                CAST(m.rev_c AS DOUBLE) * 1000000.0 / CAST(y.rev_c AS DOUBLE)
                  - 1000000.0 AS yoy_delta_ppm
         FROM m LEFT JOIN m p ON m.month = p.month + INTERVAL 1 MONTH
                LEFT JOIN m y ON m.month = y.month + INTERVAL 12 MONTH
         ORDER BY m.month""",
    // ANSI tri-valued NOT IN: NULL probe keys never qualify
    "p10_not_in_nullable" ->
      """SELECT c_custkey, nullif(c_custkey % 100, 7) AS probe
         FROM customer
         WHERE nullif(c_custkey % 100, 7) NOT IN
               (SELECT o_orderkey % 100 FROM orders WHERE o_orderkey % 100 < 20)
         ORDER BY c_custkey""",
    // the melt stated as UNION ALL — one branch per metric; the
    // engine's single-scan Expand must aggregate identically
    "a23_unpivot" ->
      """WITH long AS (
           SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
           UNION ALL
           SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
           UNION ALL
           SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
           UNION ALL
           SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
         SELECT l_returnflag, metric, count(*) AS n,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM long GROUP BY 1, 2 ORDER BY l_returnflag, metric""",
    "j7_fuzzy_names" ->
      """WITH k AS (SELECT c_custkey AS id, lower(trim(c_name)) AS name,
                           substring(lower(trim(c_name)), 1, 1) AS blk_c,
                           substring(lower(trim(c_name)), -1, 1) AS blk_e,
                           CAST(length(lower(trim(c_name))) // 4 AS INT) AS blk_l
                    FROM customer WHERE c_custkey <= 2000)
         SELECT a.id AS id_a, b.id AS id_b, a.name AS name_a, b.name AS name_b,
                levenshtein(a.name, b.name) AS dist
         FROM k a JOIN k b ON a.blk_c = b.blk_c AND a.blk_e = b.blk_e
                          AND a.blk_l = b.blk_l AND a.id < b.id
         WHERE levenshtein(a.name, b.name) <= 1
         ORDER BY id_a, id_b""",
    "a18_group_arrays" ->
      """SELECT o_orderstatus,
                array_to_string(list_sort(list(DISTINCT o_orderpriority)), '|') AS priorities,
                count(*) AS n
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "a17_percentiles" ->
      """SELECT o_orderstatus,
                quantile_cont(o_totalprice, 0.5) AS p50,
                quantile_cont(o_totalprice, 0.95) AS p95,
                quantile_cont(o_totalprice, 0.99) AS p99,
                count(*) AS n
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "j8_asof_join" ->
      """WITH r AS (SELECT o_custkey AS user_id, CAST(o_orderdate AS DATE) AS odate,
                           o_orderkey, o_totalprice,
                           row_number() OVER (PARTITION BY o_custkey, CAST(o_orderdate AS DATE)
                                              ORDER BY o_orderkey DESC) AS rn
                    FROM orders),
           r1 AS (SELECT user_id, odate, o_orderkey, o_totalprice FROM r WHERE rn = 1),
           l AS (SELECT event_id, user_id, CAST(ts AS DATE) AS event_date FROM events)
         SELECT l.event_id, l.user_id, l.event_date,
                r1.o_orderkey AS asof_o_orderkey, r1.o_totalprice AS asof_o_totalprice
         FROM l ASOF LEFT JOIN r1 ON l.user_id = r1.user_id AND l.event_date >= r1.odate
         ORDER BY event_id""",
    "d5_scd2_history" ->
      """SELECT user_id, event_type,
                ts AS effective_from,
                lead(ts) OVER w AS effective_to,
                CAST(lead(ts) OVER w IS NULL AS INT) AS is_current,
                CAST(row_number() OVER w AS INT) AS version
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY user_id ASC NULLS FIRST, version""",
    "f22_union_by_name" ->
      """SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderstatus
         FROM orders WHERE o_orderkey % 2 = 0
         UNION ALL
         SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderkey % 2 = 1
         ORDER BY o_orderkey""",
    // the textbook CORRELATED form — the scalar SUM re-correlated per
    // (part, supplier) pair; hash-equality proves the Spark side's
    // one-shuffle conditional-aggregate decorrelation is exact (the
    // NULL scalar on pairs with no 1997 rows ≡ qty_1997 > 0)
    "j17_excess_parts" ->
      """SELECT s_suppkey, s_name
         FROM supplier
         WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                               JOIN region ON n_regionkey = r_regionkey
                               WHERE r_name = 'EUROPE')
           AND s_suppkey IN (
             SELECT ps.l_suppkey
             FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
             WHERE ps.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
               AND (SELECT SUM(CAST(l.l_quantity AS DECIMAL(18,2))) FROM lineitem l
                    WHERE l.l_partkey = ps.l_partkey AND l.l_suppkey = ps.l_suppkey)
                   > 2 * (SELECT SUM(CAST(l.l_quantity AS DECIMAL(18,2))) FROM lineitem l
                          WHERE l.l_partkey = ps.l_partkey AND l.l_suppkey = ps.l_suppkey
                            AND l.l_shipdate >= TIMESTAMP '1997-01-01'
                            AND l.l_shipdate < TIMESTAMP '1998-01-01'))
         ORDER BY s_name, s_suppkey""",
    // Q2's correlated MIN kept correlated — the window decorrelation
    // must reproduce it exactly, including min-cost ties (both rows out)
    "j18_min_cost_supplier" ->
      """WITH cost AS (SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS cost
                       FROM lineitem GROUP BY 1, 2),
              rs AS (SELECT s_suppkey, s_name, s_acctbal, n_name
                     FROM supplier JOIN nation ON s_nationkey = n_nationkey
                                   JOIN region ON n_regionkey = r_regionkey
                     WHERE r_name = 'AMERICA')
         SELECT rs.s_acctbal, rs.s_name, rs.n_name, p.p_partkey, p.p_brand, c.cost
         FROM cost c JOIN rs ON c.l_suppkey = rs.s_suppkey
                     JOIN part p ON c.l_partkey = p.p_partkey
         WHERE p.p_type = 'STANDARD' AND p.p_size <= 25
           AND c.cost = (SELECT MIN(c2.cost)
                         FROM cost c2 JOIN rs rs2 ON c2.l_suppkey = rs2.s_suppkey
                         WHERE c2.l_partkey = c.l_partkey)
         ORDER BY rs.s_acctbal DESC, rs.n_name, rs.s_name, p.p_partkey LIMIT 100""",
    // residual predicate INSIDE the outer-join condition — moved after
    // the join it would delete the zero-count customers
    "j19_order_distribution" ->
      """SELECT c_count, count(*) AS custdist
         FROM (SELECT c_custkey, count(o_orderkey) AS c_count
               FROM customer LEFT OUTER JOIN orders
                 ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '%URGENT%'
               GROUP BY c_custkey) cc
         GROUP BY c_count
         ORDER BY custdist DESC, c_count DESC""",
    // the audit form: exact counts verified outright; the HLL verdict
    // bits must be TRUE or the sketch drifted past its bound
    "a15_approx_distinct" ->
      """SELECT count(DISTINCT l_orderkey) AS exact_orderkeys,
                count(DISTINCT l_partkey) AS exact_partkeys,
                count(*) AS n_rows,
                TRUE AS orderkeys_within_5pct,
                TRUE AS partkeys_within_5pct
         FROM lineitem""",
    // the NOT IN form — with non-null keys ≡ the engine's LEFT ANTI
    "j20_supplier_part_counts" ->
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
         FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
         JOIN part ON p_partkey = l_partkey
         WHERE p_brand <> 'Brand#3' AND p_type NOT LIKE 'PROMO%'
           AND p_size IN (5, 10, 15, 20, 25, 30)
           AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         GROUP BY 1, 2, 3
         ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
    // the scalar subquery re-reads the same aggregate the outer query
    // groups — the exchange-reuse shape, float-free threshold
    "j21_part_value_share" ->
      """WITH pv AS (SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
                     FROM lineitem GROUP BY 1)
         SELECT l_partkey, CAST(value AS DOUBLE) AS value
         FROM pv WHERE value * 1500 > (SELECT SUM(value) FROM pv)
         ORDER BY value DESC, l_partkey""",
    // disjunctive nation-pair kept disjunctive — the engine's
    // pre-filtered supp≠cust residual must reproduce it exactly
    "j22_volume_shipping" ->
      """SELECT supp_nation, cust_nation, l_year,
                CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
         FROM (SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
                      EXTRACT(year FROM l_shipdate) AS l_year,
                      l_extendedprice, l_discount
               FROM lineitem
                    JOIN orders   ON l_orderkey = o_orderkey
                    JOIN supplier ON l_suppkey = s_suppkey
                    JOIN customer ON o_custkey = c_custkey
                    JOIN nation ns ON s_nationkey = ns.n_nationkey
                    JOIN nation nc ON c_nationkey = nc.n_nationkey
               WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
                   OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
                 AND l_shipdate >= TIMESTAMP '1996-01-01'
                 AND l_shipdate < TIMESTAMP '1998-01-01') t
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    // CASE-ratio as exact integer ppm — the division itself is under
    // the hash gate, not just the two sums
    "j23_market_share" ->
      """WITH f AS (
           SELECT EXTRACT(year FROM o_orderdate) AS o_year,
                  CAST(SUM(CASE WHEN n_name = 'NATION_3'
                                THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))
                                ELSE CAST(0.0 AS DECIMAL(28,6)) END) AS DECIMAL(38,6)) AS num,
                  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DECIMAL(38,6)) AS den
           FROM lineitem
                JOIN part     ON l_partkey = p_partkey
                JOIN orders   ON l_orderkey = o_orderkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation   ON s_nationkey = n_nationkey
           WHERE p_type = 'ECONOMY'
             AND o_custkey IN (SELECT c_custkey FROM customer
                               WHERE c_nationkey IN
                                 (SELECT n_nationkey FROM nation
                                  JOIN region ON n_regionkey = r_regionkey
                                  WHERE r_name = 'AMERICA'))
             AND o_orderdate >= TIMESTAMP '1996-01-01'
             AND o_orderdate < TIMESTAMP '1998-01-01'
           GROUP BY 1)
         SELECT o_year,
                CAST(floor(num) AS BIGINT) AS nation_rev,
                CAST(floor(den) AS BIGINT) AS total_rev,
                CAST(floor(num) AS BIGINT) * 1000000 // CAST(floor(den) AS BIGINT) AS share_ppm
         FROM f ORDER BY o_year""",
    // the textbook agg-then-rejoin cost table — hash-equality proves
    // the engine's one-shuffle window formulation exact
    "j24_product_profit" ->
      """WITH rl AS (SELECT l_orderkey, l_partkey, l_suppkey, l_quantity,
                            l_extendedprice, l_discount
                     FROM lineitem JOIN part ON l_partkey = p_partkey
                     WHERE p_name LIKE '%red%'),
              c AS (SELECT l_partkey, l_suppkey,
                           MIN(l_extendedprice / l_quantity) AS unit_cost
                    FROM rl GROUP BY 1, 2)
         SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
                CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 1000000.0) AS BIGINT)
                       - CAST(floor((unit_cost * l_quantity) * 1000000.0) AS BIGINT)) AS BIGINT) AS profit_micro
         FROM rl JOIN c USING (l_partkey, l_suppkey)
                 JOIN orders   ON l_orderkey = o_orderkey
                 JOIN supplier ON l_suppkey = s_suppkey
                 JOIN nation   ON s_nationkey = n_nationkey
         GROUP BY 1, 2 ORDER BY nation, o_year DESC""",
    "j25_returned_items" ->
      """SELECT c_custkey, c_name, revenue, c_acctbal, n_name, c_mktsegment
         FROM (SELECT o_custkey,
                      CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey
               WHERE l_returnflag = 'R'
                 AND o_orderdate >= TIMESTAMP '1997-01-01'
                 AND o_orderdate < TIMESTAMP '1997-04-01'
               GROUP BY o_custkey) r
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "j26_promo_share" ->
      """WITH f AS (
           SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                                THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))
                                ELSE CAST(0.0 AS DECIMAL(28,6)) END) AS DECIMAL(38,6)) AS num,
                  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DECIMAL(38,6)) AS den
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE l_shipdate >= TIMESTAMP '1997-09-01'
             AND l_shipdate < TIMESTAMP '1997-10-01')
         SELECT CAST(floor(num) AS BIGINT) AS promo_rev,
                CAST(floor(den) AS BIGINT) AS total_rev,
                CAST(floor(num) AS BIGINT) * 1000000 // CAST(floor(den) AS BIGINT) AS promo_ppm
         FROM f""",
    // the scalar max re-reads the same aggregate (Q15's view) — exact
    // decimal equality, so min-cost-style ties all surface
    "j27_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey,
                             SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS total_rev
                      FROM lineitem
                      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                        AND l_shipdate < TIMESTAMP '1997-04-01'
                        AND l_suppkey IS NOT NULL
                      GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
         FROM rev JOIN supplier ON l_suppkey = s_suppkey
         WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
         ORDER BY s_suppkey""",
    "j28_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
                count(*) AS n_lines
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount >= 0.05 AND l_discount <= 0.07
           AND l_quantity < 24""",
    // Q12's CASE-pair conditional aggregate on the schema's stand-ins
    "j29_shipmode_priority" ->
      """SELECT l_returnflag AS shipmode,
                CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         WHERE l_returnflag IN ('A', 'R')
           AND l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
         GROUP BY l_returnflag
         ORDER BY shipmode""",
    "x85_column_stats" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      cols.map(c =>
        s"""SELECT '$c' AS column_name, count(*) AS n_rows,
                   count(DISTINCT $c) AS ndv,
                   min($c) AS min_val, max($c) AS max_val,
                   quantile_cont($c, 0.25) AS p25,
                   quantile_cont($c, 0.5) AS p50,
                   quantile_cont($c, 0.75) AS p75
            FROM lineitem""").mkString("", " UNION ALL ", " ORDER BY column_name")
    },
    "w3_analytic_suite" ->
      """SELECT o_custkey, o_orderkey,
                dense_rank() OVER w AS drnk,
                lead(o_totalprice, 1) OVER w AS next_price,
                ntile(4) OVER w AS quartile,
                percent_rank() OVER w AS pct_rank,
                cume_dist() OVER w AS cdist,
                first_value(o_totalprice) OVER wf AS first_price,
                nth_value(o_totalprice, 2) OVER wf AS second_price
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY o_custkey, o_orderkey""",
    // Benford expectations stated as the same integer literals — log10
    // at runtime would be libm-dependent on either engine
    "x87_benford_audit" ->
      """WITH digits AS (
           SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
           FROM orders WHERE o_totalprice >= 1.0),
          counts AS (SELECT digit, count(*) AS n_obs FROM digits GROUP BY digit),
          t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS total FROM counts),
          e(digit, expected_ppm) AS (VALUES (1, 301029), (2, 176091), (3, 124938),
            (4, 96910), (5, 79181), (6, 66946), (7, 57991), (8, 51152), (9, 45757))
         SELECT c.digit, c.n_obs,
                c.n_obs * 1000000 // t.total AS obs_ppm,
                CAST(e.expected_ppm AS BIGINT) AS expected_ppm,
                abs(c.n_obs * 1000000 // t.total - e.expected_ppm) AS delta_ppm
         FROM counts c JOIN e ON c.digit = e.digit, t
         ORDER BY c.digit""",
    "x88_locf_impute" ->
      """WITH daily AS (
           SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
                  max(o_totalprice) AS day_price
           FROM orders
           WHERE o_orderdate >= TIMESTAMP '1997-03-01'
             AND o_orderdate < TIMESTAMP '1997-04-01'
           GROUP BY 1, 2),
          spine AS (
           SELECT o_custkey, CAST(unnest(generate_series(
                    DATE '1997-03-01', DATE '1997-03-31', INTERVAL 1 DAY)) AS DATE) AS day
           FROM (SELECT DISTINCT o_custkey FROM daily))
         SELECT s.o_custkey, s.day, d.day_price,
                last_value(d.day_price IGNORE NULLS) OVER (
                  PARTITION BY s.o_custkey ORDER BY s.day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_price
         FROM spine s LEFT JOIN daily d
           ON s.o_custkey = d.o_custkey AND s.day = d.day
         ORDER BY s.o_custkey, s.day""",
    // identical (mn, bw) arithmetic, floor not round — bucket ids and
    // edges reproduce bit-for-bit
    "x89_histogram" ->
      """WITH st AS (SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
                     FROM lineitem),
          b AS (SELECT least(CAST(floor((l_extendedprice - mn) / (mx - mn) * 32) AS BIGINT),
                             31) AS bucket, mn, mx
                FROM lineitem, st)
         SELECT bucket,
                mn + CAST(bucket AS DOUBLE) * ((mx - mn) / 32.0) AS lo_edge,
                mn + CAST(bucket + 1 AS DOUBLE) * ((mx - mn) / 32.0) AS hi_edge,
                count(*) AS n_rows
         FROM b GROUP BY bucket, mn, mx ORDER BY bucket""",
    "x86_gap_fill" ->
      """WITH daily AS (
           SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
                  SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend,
                  count(*) AS n_orders
           FROM orders
           WHERE o_orderdate >= TIMESTAMP '1997-03-01'
             AND o_orderdate < TIMESTAMP '1997-04-01'
           GROUP BY 1, 2),
          spine AS (
           SELECT o_custkey, CAST(unnest(generate_series(
                    DATE '1997-03-01', DATE '1997-03-31', INTERVAL 1 DAY)) AS DATE) AS day
           FROM (SELECT DISTINCT o_custkey FROM daily)),
          filled AS (
           SELECT s.o_custkey, s.day,
                  COALESCE(d.spend, CAST(0 AS DECIMAL(18,2))) AS spend_dec,
                  COALESCE(d.n_orders, 0) AS n_orders
           FROM spine s LEFT JOIN daily d
             ON s.o_custkey = d.o_custkey AND s.day = d.day)
         SELECT o_custkey, day, CAST(spend_dec AS DOUBLE) AS spend, n_orders,
                CAST(SUM(spend_dec) OVER (PARTITION BY o_custkey ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_spend
         FROM filled ORDER BY o_custkey, day""",
    // one oracle, two plans: plain and salted must hash-match it
    "q_skew_plain" -> SkewOracle,
    "q_skew_salted" -> SkewOracle,
    // one oracle, two layouts: plain-parquet and bucketed must hash-match
    "q_join_plain_layout" -> LayoutOracle,
    "q_bucketed_join" -> LayoutOracle)

  private val SkewOracle =
    """SELECT s_nationkey, count(*) AS n_lines,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
              CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
       FROM lineitem JOIN supplier
         ON s_suppkey = (CASE WHEN l_orderkey % 5 < 4 THEN 7 ELSE l_suppkey END)
       GROUP BY s_nationkey ORDER BY s_nationkey"""

  private val LayoutOracle =
    """SELECT o_orderpriority, count(*) AS n_lines,
              CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       GROUP BY o_orderpriority ORDER BY o_orderpriority"""
}
