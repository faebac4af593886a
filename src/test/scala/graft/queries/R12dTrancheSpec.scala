package graft.queries

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Behavior pins for the fourth round-12 tranche (X226-X228): the
  * schema-merge read's no-rewrite invariant, the blocking recall
  * audit's accounting, and the lateness curve's bound semantics. */
class R12dTrancheSpec extends SparkSpecBase {

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sfDir)

  test("x201: epoch-0 files carry NO channel column; the merged read backfills null → 'legacy'") {
    val rows = run("x201_schema_merge_read").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val root = Warehouse.scratch("schemaevo_orders", sfDir)
    val e0 = spark.read.parquet(root + "/e0")
    assert(!e0.columns.contains("channel"),
      "the additive migration must not rewrite old files — epoch 0 keeps the old schema")
    assert(spark.read.parquet(root + "/e1").columns.contains("channel"))
    // every pre-cutover order lands in 'legacy', nothing else does
    assert(rows("legacy")._1 == e0.count(),
      "legacy bucket must hold exactly the epoch-0 rows")
    assert(rows.keySet == Set("legacy", "web", "store", "app"))
    assert(rows.values.map(_._1).sum == Tables.orders(spark, sfDir).count())
  }

  test("x202: hits ≤ truth, hits ⊆ candidates by construction, ppm arithmetic exact") {
    val rows = run("x202_blocking_recall").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (t, h, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(h <= t, "hits cannot exceed truth")
      assert(ppm == h * 1000000L / t, "recall ppm must be the exact integer ratio")
    }
  }

  test("x203: loss is monotone nonincreasing in delay and zero past the max jitter") {
    val rows = run("x203_lateness_curve").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0L, 1800L, 3600L, 7200L))
    rows.zip(rows.tail).foreach { case ((_, _, l1), (_, _, l2)) =>
      assert(l2 <= l1, "a longer delay can only drop fewer events") }
    // arrival jitter is < 7200 s, so at delay = 7200 s no event can be
    // behind the simulated watermark — the curve must hit exactly zero
    assert(rows.last._3 == 0L,
      "delay ≥ max jitter must lose nothing (the curve's calibration point)")
    // independent recomputation of the delay-0 loss via the naive
    // single-window simulation (fine at spec SF; the gate's two-phase
    // form must agree exactly). At sf0.001 events are sparse enough
    // that the ≤2 h jitter may never reorder arrivals — zero is then
    // the CORRECT answer, which is why this pins equality, not
    // positivity (the sf0.1 gate measures a nonzero curve).
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sfDir).select(col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      .withColumn("arr_us", col("ts_us") + (col("event_id") % 7200) * 1000000L)
    val naive = ev.withColumn("wm", max("ts_us").over(
        Window.orderBy("arr_us", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)))
      .filter(col("wm").isNotNull && col("ts_us") < col("wm"))
      .count()
    assert(rows.head._3 == naive,
      "two-phase running max must equal the naive single-window simulation")
  }
}
