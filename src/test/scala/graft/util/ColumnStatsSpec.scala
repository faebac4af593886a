package graft.util

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins x85's stats building block: values identical to the naive
  * countDistinct form, and NO Expand in the plan — the guard VERDICT
  * r9 asked for on EAGERLY-executed builds, whose final result is a
  * LocalTableScan the whole-surface plan audits can't see into. */
class ColumnStatsSpec extends SparkSpecBase {

  private lazy val li = graft.Tables.lineitem(spark, sfDir)

  test("onePass matches countDistinct/min/max/count semantics") {
    for (c <- Seq("l_quantity", "l_discount")) {
      val st = ColumnStats.onePass(li, c).head()
      val naive = li.agg(
        countDistinct(col(c).cast("double")).as("ndv"),
        min(col(c).cast("double")).as("mn"),
        max(col(c).cast("double")).as("mx"),
        count(lit(1)).as("n")).head()
      assert(st.getAs[Long]("ndv") === naive.getAs[Long]("ndv"), c)
      assert(st.getAs[Double]("mn") === naive.getAs[Double]("mn"), c)
      assert(st.getAs[Double]("mx") === naive.getAs[Double]("mx"), c)
      assert(st.getAs[Long]("n") === naive.getAs[Long]("n"), c)
    }
  }

  test("onePass counts the null group into n but not ndv") {
    import spark.implicits._
    val df = Seq(Some(1.0), Some(1.0), Some(2.0), None).toDF("v")
    val st = ColumnStats.onePass(df, "v").head()
    assert(st.getAs[Long]("ndv") === 2L)
    assert(st.getAs[Long]("n") === 4L)
  }

  test("onePass plans no Expand (single-branch aggregate chain)") {
    val plan = ColumnStats.onePass(li, "l_quantity")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"Expand found:\n$plan")
  }
}
