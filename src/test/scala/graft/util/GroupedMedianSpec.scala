package graft.util

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins GroupedMedian.med2 ≡ 2 × the engine's sort-based percentile on
  * adversarial geometries: even/odd n, the two middle ranks straddling
  * a coarse-bucket boundary, tie-heavy columns, and singleton groups.
  * x115 then carries the DuckDB median equivalence under the hash gate. */
class GroupedMedianSpec extends SparkSpecBase {
  import spark.implicits._

  private def check(vals: Map[String, Seq[Long]], coarseDiv: Long): Unit = {
    val df = vals.toSeq.flatMap { case (g, vs) => vs.map(g -> _) }
      .toDF("g", "v")
    val got = GroupedMedian.med2(df, "g", "v", coarseDiv)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = vals.map { case (g, vs) =>
      val s = vs.sorted
      val n = s.size
      g -> (s((n - 1) / 2) + s(n / 2))
    }
    assert(got === want, s"div=$coarseDiv vals=$vals")
  }

  test("odd and even n recover the sort-based median exactly") {
    check(Map("odd" -> Seq(5L, 1L, 9L), "even" -> Seq(4L, 1L, 3L, 2L)), 2L)
  }

  test("middle ranks straddling the bucket boundary surface from two buckets") {
    // div 1000: 999 | 1001 land in buckets 0 and 1; med2 = 2000 needs
    // one row from EACH bucket's rank window
    check(Map("a" -> Seq(999L, 1001L)), 1000L)
    // four values, k1/k2 = ranks 2,3 in different buckets
    check(Map("b" -> Seq(10L, 999L, 1001L, 5000L)), 1000L)
  }

  test("tie-heavy and degenerate groups: all-equal, singleton, two equal") {
    check(Map("ties" -> Seq(7L, 7L, 7L, 7L, 7L), "one" -> Seq(42L),
      "pair" -> Seq(3L, 3L)), 10L)
  }

  test("coarseDiv 1 (every value its own bucket) and huge div (one bucket) agree") {
    val vals = Map("g" -> Seq(13L, 2L, 8L, 21L, 5L, 5L, 34L))
    check(vals, 1L)
    check(vals, 1000000L)
  }

  test("matches Spark's percentile on the sf corpus per event type") {
    val e = graft.Tables.events(spark, sfDir)
      .select(col("event_type"), round(col("value") * 100).cast("long").as("vc"))
    val got = GroupedMedian.med2(e, "event_type", "vc", 100L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = e.groupBy("event_type")
      .agg((expr("percentile(vc, 0.5)") * 2).cast("long").as("m2"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
  }
}
