package graft.queries

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Pins for x85 ANALYZE-style column stats: all four columns' stats
  * ride ONE fact scan, and the unpivot is a projection, not a second
  * aggregate. Values are under the oracle hash-gate. */
class ColumnStatsSpec extends SparkSpecBase {

  test("one fact scan feeds every column's stats; stack unpivots without re-aggregating") {
    val df = Relational.queries("x85_column_stats")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert("lineitem\\.parquet".r.findAllIn(plan).length === 1,
      s"stats for all columns must share one scan:\n$plan")
    // no join, no window — a stats pass is aggregate + generate only
    assert(!plan.contains("Join") && !plan.contains("Window"), plan)
    val rows = df.collect()
    assert(rows.length === 4)
    val n = Tables.lineitem(spark, sfDir).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") === n)
      assert(r.getAs[Long]("ndv") <= n)
      assert(r.getAs[Double]("min_val") <= r.getAs[Double]("p25"))
      assert(r.getAs[Double]("p25") <= r.getAs[Double]("p50"))
      assert(r.getAs[Double]("p50") <= r.getAs[Double]("p75"))
      assert(r.getAs[Double]("p75") <= r.getAs[Double]("max_val"))
    }
  }
}
