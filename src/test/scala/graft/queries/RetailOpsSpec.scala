package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Planted-data pins for the retail-analytics batch (x112 RFM
  * segmentation, j30 repeat-purchase interval, a25 deterministic mode).
  * Each test writes a tiny synthetic orders/customer table in the
  * driver layout and runs the REGISTERED query, so the full pipeline —
  * TopFrac.tiles included — is what's asserted. Corpus-scale values sit
  * under the oracle hash gate. */
class RetailOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def day(i: Int) = new java.sql.Timestamp(1700006400000L + i * 86400000L)

  private def ordersDir(rows: Seq[(Long, Long, Double, java.sql.Timestamp, String)],
                        segs: Map[Long, String] = Map.empty): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_retail").toString
    rows.map { case (ok, ck, tp, od, pr) => (ok, ck, "O", tp, od, pr) }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    if (segs.nonEmpty)
      segs.toSeq.map { case (ck, sg) => (ck, s"c$ck", 0, 0.0, sg) }
        .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    dir
  }

  test("x112: hand-computed R/F/M quintiles and segment labels on five planted customers") {
    // 5 customers → quintile = rank−1 on each axis. Recency ranks by
    // last order day (ties impossible here); frequency ties (c3,c4,c5
    // all 1 order) break by custkey; monetary is the cents sum.
    val dir = ordersDir(Seq(
      (1L, 1L, 100.0, day(8), "x"), (2L, 1L, 100.0, day(9), "x"),
      (3L, 1L, 100.0, day(10), "x"),
      (4L, 2L, 50.0, day(6), "x"), (5L, 2L, 50.0, day(7), "x"),
      (6L, 3L, 500.0, day(5), "x"),
      (7L, 4L, 20.0, day(2), "x"),
      (8L, 5L, 10.0, day(0), "x")))
    val got = Relational.queries("x112_rfm_segments")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    assert(got === Map(
      1L -> ((0, 0, 1, "champion")),
      2L -> ((1, 1, 2, "regular")),
      3L -> ((2, 2, 0, "regular")),
      4L -> ((3, 3, 3, "hibernating")),
      5L -> ((4, 4, 4, "hibernating"))), s"rfm: $got")
  }

  test("j30: gaps from consecutive orders only; single-order customers drop; same-day gap is 0") {
    val dir = ordersDir(Seq(
      (1L, 1L, 1.0, day(0), "x"), (2L, 1L, 1.0, day(10), "x"),
      (3L, 1L, 1.0, day(30), "x"),           // gaps 10, 20
      (4L, 2L, 1.0, day(3), "x"),            // single order → excluded
      (5L, 3L, 1.0, day(5), "x"), (6L, 3L, 1.0, day(5), "x")), // same day → gap 0
      segs = Map(1L -> "AUTO", 2L -> "AUTO", 3L -> "BIKE"))
    val got = Relational.queries("j30_reorder_gap")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got === Map(
      "AUTO" -> ((1L, 2L, 30L, 15.0)),
      "BIKE" -> ((1L, 1L, 0L, 0.0))), s"gaps: $got")
  }

  test("a25: mode per month; ties resolve to the smallest value") {
    val dir = ordersDir(Seq(
      // month of day(0): 1-URGENT ×2, 2-HIGH ×2 (tie → 1-URGENT), 3-LOW ×1
      (1L, 1L, 1.0, day(0), "1-URGENT"), (2L, 1L, 1.0, day(1), "1-URGENT"),
      (3L, 1L, 1.0, day(2), "2-HIGH"), (4L, 1L, 1.0, day(3), "2-HIGH"),
      (5L, 1L, 1.0, day(4), "3-LOW"),
      // next month (day 40): clear winner 5-LOW ×2 over 1-URGENT ×1
      (6L, 1L, 1.0, day(40), "5-LOW"), (7L, 1L, 1.0, day(41), "5-LOW"),
      (8L, 1L, 1.0, day(42), "1-URGENT")))
    val got = Relational.queries("a25_mode")(spark, dir)
      .collect().map(r => r.getAs[java.sql.Date]("ym").toString ->
        ((r.getString(1), r.getLong(2))))
    assert(got.toSeq === Seq(
      "2023-11-01" -> (("1-URGENT", 2L)),
      "2023-12-01" -> (("5-LOW", 2L))), s"modes: ${got.toSeq}")
  }

  test("x118: hand Ginis — equality at 0, the 2-customer case, and a band-crossing pair") {
    val dir = ordersDir(Seq(
      // seg A: 100c and 300c → G = 0.25
      (1L, 1L, 1.0, day(0), "x"), (2L, 2L, 3.0, day(0), "x"),
      // seg B: three equal spends → G = 0
      (3L, 3L, 2.0, day(0), "x"), (4L, 4L, 2.0, day(0), "x"),
      (5L, 5L, 2.0, day(0), "x"),
      // seg C: 2,000,000c (band 1) and 100,000c (band 0) — the
      // triangular lower-band count supplies rank 2
      (6L, 6L, 20000.0, day(0), "x"), (7L, 7L, 1000.0, day(0), "x")),
      segs = Map(1L -> "A", 2L -> "A", 3L -> "B", 4L -> "B", 5L -> "B",
        6L -> "C", 7L -> "C"))
    val got = Relational.queries("x118_gini")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("A") === ((2L, 400L, 0.25)), s"A: $got")
    assert(got("B") === ((3L, 600L, 0.0)), s"B: $got")
    val expC = (2 * 4100000.0 - 3.0 * 2100000.0) / (2.0 * 2100000.0)
    assert(got("C") === ((2L, 2100000L, expC)), s"C: $got")
  }

  test("x112 plan: no corpus-sized unpartitioned window — tiles runs on the histogram") {
    val plan = Relational.queries("x112_rfm_segments")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // every row_number window is bucket-partitioned; the only
    // unpartitioned windows run over the metadata-sized histogram
    // (TopFrac.tiles contract, WindowScaleSafetySpec's global ban
    // covers the corpus shape)
    assert(!plan.contains("TakeOrderedAndProject(limit=9223372036854775807"),
      "no degenerate global sort")
  }
}
