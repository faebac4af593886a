package graft.queries

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Pins for x85 ANALYZE-style column stats (values are under the
  * oracle hash-gate; ExactQuantilesSpec pins the quartile machinery):
  * ordering invariants across all four columns, and agreement of the
  * two-phase quartiles with the built-in exact percentile. */
class ColumnStatsSpec extends SparkSpecBase {

  test("stats rows hold ordering invariants and match builtin percentile") {
    val df = Relational.queries("x85_column_stats")(spark, sfDir)
    val rows = df.collect()
    assert(rows.length === 4)
    val n = Tables.lineitem(spark, sfDir).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") === n)
      assert(r.getAs[Long]("ndv") <= n && r.getAs[Long]("ndv") >= 1)
      assert(r.getAs[Double]("min_val") <= r.getAs[Double]("p25"))
      assert(r.getAs[Double]("p25") <= r.getAs[Double]("p50"))
      assert(r.getAs[Double]("p50") <= r.getAs[Double]("p75"))
      assert(r.getAs[Double]("p75") <= r.getAs[Double]("max_val"))
    }
    // spot-check one column's quartiles against the single-buffer builtin
    val want = Tables.lineitem(spark, sfDir)
      .agg(expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))"))
      .first().getSeq[Double](0)
    val got = rows.find(_.getString(0) == "l_extendedprice").get
    assert(Seq(got.getAs[Double]("p25"), got.getAs[Double]("p50"),
      got.getAs[Double]("p75")) === want)
  }
}
