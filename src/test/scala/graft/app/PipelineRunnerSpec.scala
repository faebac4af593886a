package graft.app

import graft.SparkSpecBase
import graft.Tables
import org.apache.spark.sql.functions._
import java.nio.file.Files

class PipelineRunnerSpec extends SparkSpecBase {

  test("full run loads every source order once, QC-gated") {
    val wh = Files.createTempDirectory("graft_wh_full").toString
    val r = PipelineRunner.run(spark, sfDir, wh)
    val srcOrders = Tables.orders(spark, sfDir).count()
    assert(r.hwmBefore === -1L)
    assert(r.extracted === srcOrders)
    assert(r.loaded === srcOrders)
    assert(r.qcPassed)
    // dense, replay-safe surrogate keys: 1..n
    val fact = spark.read.parquet(s"$wh/loan_fact")
    assert(fact.agg(min("fact_id"), max("fact_id")).first().toSeq === Seq(1L, srcOrders))
  }

  test("second run is a no-op; partial first load extracts only the delta") {
    val wh = Files.createTempDirectory("graft_wh_incr").toString
    // simulate an earlier snapshot: preload facts for the first half of keys
    val half = Tables.orders(spark, sfDir)
      .agg(expr("percentile_approx(o_orderkey, 0.5)")).first().get(0).toString.toDouble.toLong
    val seeded = PipelineRunner.cleanOrders(
      Tables.orders(spark, sfDir).filter(col("o_orderkey") <= half))
    import org.apache.spark.sql.expressions.Window
    seeded.select(
      row_number().over(Window.orderBy("o_orderkey")).cast("long").as("fact_id"),
      col("o_orderkey").as("source_order_key"),
      col("o_custkey").as("customer_id"),
      date_format(col("order_date"), "yyyyMMdd").cast("int").as("date_id"),
      col("amount"), col("priority_num"), col("status"),
      year(col("order_date")).as("load_year"))
      .write.partitionBy("load_year").parquet(s"$wh/loan_fact")
    // a prior run would also have left the date dimension behind
    graft.dims.DateDim.fromColumn(seeded, "order_date").write.parquet(s"$wh/date_dim")

    val r1 = PipelineRunner.run(spark, sfDir, wh)
    val total = Tables.orders(spark, sfDir).count()
    assert(r1.hwmBefore === half)
    assert(r1.extracted === total - seeded.count())
    assert(r1.loaded === total)
    assert(r1.qcPassed)

    // nothing new → extract 0, warehouse unchanged, still consistent
    val r2 = PipelineRunner.run(spark, sfDir, wh)
    assert(r2.extracted === 0L)
    assert(r2.loaded === total)
    assert(r2.qcPassed)

    // replay safety: fact_ids unique and dense across the three loads
    val fact = spark.read.parquet(s"$wh/loan_fact")
    assert(fact.select("fact_id").distinct().count() === total)
    assert(fact.agg(max("fact_id")).first().getLong(0) === total)
  }
}
