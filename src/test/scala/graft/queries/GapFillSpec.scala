package graft.queries

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Pins for x86 time-series gap fill: dense 31-day calendar per active
  * entity, zero-filled gaps, cumulative consistency. Values are under
  * the oracle hash-gate. */
class GapFillSpec extends SparkSpecBase {

  test("every active customer gets exactly the full March calendar, gaps zero-filled") {
    val df = Relational.queries("x86_gap_fill")(spark, sfDir).cache()
    val perCust = df.groupBy("o_custkey").agg(
      count(lit(1)).as("n_days"),
      countDistinct("day").as("n_distinct"),
      min("day").as("d0"), max("day").as("d1"),
      sum(when(col("n_orders") === 0, 1).otherwise(0)).as("n_gaps"),
      sum("spend").as("total"), max("cum_spend").as("final_cum"))
    perCust.collect().foreach { r =>
      assert(r.getAs[Long]("n_days") === 31L)
      assert(r.getAs[Long]("n_distinct") === 31L)
      assert(r.getAs[java.sql.Date]("d0").toString === "1997-03-01")
      assert(r.getAs[java.sql.Date]("d1").toString === "1997-03-31")
      // cumulative over the filled series ends at the series total
      assert(math.abs(r.getAs[Double]("final_cum") - r.getAs[Double]("total")) < 1e-6)
    }
    // gap rows carry zero spend
    assert(df.filter(col("n_orders") === 0 && col("spend") =!= 0.0).count() === 0)
    // the active-customer set is exactly the customers ordering in March
    val active = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1997-03-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .select("o_custkey").distinct().count()
    assert(df.select("o_custkey").distinct().count() === active)
    df.unpersist()
  }
}
