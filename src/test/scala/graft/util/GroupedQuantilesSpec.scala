package graft.util

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins GroupedQuantiles ≡ Spark's built-in `percentile` (which a17's
  * oracle separately pins ≡ DuckDB quantile_cont), plus the plan-shape
  * guarantee the rewrite exists for: no partial_percentile /
  * ObjectHashAggregate single-group-buffer in the plan. */
class GroupedQuantilesSpec extends SparkSpecBase {

  private lazy val orders = graft.Tables.orders(spark, sfDir)

  test("cuts match built-in percentile bit-for-bit across groups") {
    val got = GroupedQuantiles.cuts(orders, "o_orderstatus", "o_totalprice",
      Seq("p25" -> 0.25, "p50" -> 0.5, "p95" -> 0.95, "p99" -> 0.99))
      .orderBy("o_orderstatus").collect()
    val want = orders.groupBy("o_orderstatus").agg(
      expr("percentile(o_totalprice, 0.25)").as("p25"),
      expr("percentile(o_totalprice, 0.5)").as("p50"),
      expr("percentile(o_totalprice, 0.95)").as("p95"),
      expr("percentile(o_totalprice, 0.99)").as("p99"),
      count(lit(1)).as("n"))
      .orderBy("o_orderstatus").collect()
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) === w.getString(0))
      for (i <- 1 to 4)
        assert(g.getDouble(i) === w.getDouble(i), s"cut $i of group ${g.getString(0)}")
      assert(g.getAs[Long]("n") === w.getAs[Long]("n"))
    }
  }

  test("weighted cuts over a value-count table equal unweighted over rows") {
    val vc = orders.groupBy(col("o_orderstatus"),
        col("o_totalprice").as("v")).agg(count(lit(1)).as("w"))
    val got = GroupedQuantiles.cuts(vc, "o_orderstatus", "v",
      Seq("p50" -> 0.5, "p90" -> 0.9), weight = Some("w"))
      .orderBy("o_orderstatus").collect()
    val want = GroupedQuantiles.cuts(orders, "o_orderstatus", "o_totalprice",
      Seq("p50" -> 0.5, "p90" -> 0.9))
      .orderBy("o_orderstatus").collect()
    got.zip(want).foreach { case (g, w) =>
      assert(g.getDouble(1) === w.getDouble(1))
      assert(g.getDouble(2) === w.getDouble(2))
      assert(g.getAs[Long]("n") === w.getAs[Long]("n"))
    }
  }

  test("integral-rank cuts (p=0, p=1, exact h) hit the value, no interpolation") {
    import spark.implicits._
    // 5 values: h(p=0.25)=1.0 exactly → k_lo = k_hi = 2nd value
    val df = Seq(("g", 10.0), ("g", 20.0), ("g", 30.0), ("g", 40.0), ("g", 50.0))
      .toDF("g", "v")
    val r = GroupedQuantiles.cuts(df, "g", "v",
      Seq("p0" -> 0.0, "p25" -> 0.25, "p100" -> 1.0), coarseDiv = 7.0).head()
    assert(r.getAs[Double]("p0") === 10.0)
    assert(r.getAs[Double]("p25") === 20.0)
    assert(r.getAs[Double]("p100") === 50.0)
  }

  test("no partial_percentile or group-sized ObjectHashAggregate in the plan") {
    val plan = GroupedQuantiles.cuts(orders, "o_orderstatus", "o_totalprice",
      Seq("p50" -> 0.5)).queryExecution.executedPlan.toString
    assert(!plan.contains("percentile"), s"percentile buffer found:\n$plan")
  }
}
