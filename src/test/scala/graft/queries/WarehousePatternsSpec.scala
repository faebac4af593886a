package graft.queries

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Pins the round-10 Kimball-pattern tranche (x148-x152) beyond the
  * DuckDB hash gate: the invariants each operator promises by
  * construction, checked on the real sf0.001 tables so a refactor
  * that silently weakens a guarantee (not just an output value)
  * fails by name.
  */
class WarehousePatternsSpec extends SparkSpecBase {

  test("x148 bridge allocation conserves every order's total cents exactly") {
    import org.apache.spark.sql.expressions.Window
    val lines = Tables.lineitem(spark, sfDir).select(
      col("l_orderkey"), col("l_linenumber"),
      round(col("l_extendedprice") * 100, 0).cast("long").as("w"))
    val heads = Tables.orders(spark, sfDir).select(
      col("o_orderkey").as("l_orderkey"),
      round(col("o_totalprice") * 100, 0).cast("long").as("tc"))
    val byOrder = Window.partitionBy("l_orderkey")
    val alloc = lines.join(heads, Seq("l_orderkey"))
      .withColumn("sw", sum(col("w")).over(byOrder))
      .withColumn("base", expr("(tc * w) div sw"))
      .withColumn("fr", expr("(tc * w) % sw"))
      .withColumn("rem", col("tc") - sum(expr("(tc * w) div sw")).over(byOrder))
      .withColumn("rk", row_number().over(
        byOrder.orderBy(col("fr").desc, col("l_linenumber"))))
      .select(col("l_orderkey"), col("tc"),
        (col("base") + when(col("rk") <= col("rem"), 1L).otherwise(0L)).as("alloc"))
    // conservation: Σ alloc per order == the order's cents, EVERY order
    val bad = alloc.groupBy("l_orderkey", "tc")
      .agg(sum(col("alloc")).as("got"))
      .filter(col("got") =!= col("tc"))
    assert(bad.count() === 0L, "largest-remainder apportionment leaked cents")
    // shares are never negative and never exceed the order total
    val oob = alloc.filter(col("alloc") < 0 || col("alloc") > col("tc"))
    assert(oob.count() === 0L)
  }

  test("x149 coverage grid: n_active + n_gap == n_months for every nation, " +
       "and a nation with no customers is all gap") {
    val out = Warehouse.queries("x149_factless_coverage")(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_active") + r.getAs[Long]("n_gap") ===
        r.getAs[Long]("n_months"), s"grid split broken for ${r.getAs[String]("n_name")}")
    }
    // every nation appears exactly once (the grid is the dim, not the fact)
    assert(out.map(_.getAs[String]("n_name")).distinct.length === out.length)
    // a gap row carries its first gap month; an all-active row carries ''
    out.filter(_.getAs[Long]("n_gap") > 0)
      .foreach(r => assert(r.getAs[String]("first_gap").nonEmpty))
    out.filter(_.getAs[Long]("n_gap") == 0)
      .foreach(r => assert(r.getAs[String]("first_gap") === ""))
  }

  test("x150 SCD3 matrix counts every ordering customer exactly once and " +
       "keeps single-change customers as '(none)' prior") {
    val out = Warehouse.queries("x150_scd3")(spark, sfDir)
    val total = out.agg(sum("n_customers")).head.getLong(0)
    val nCust = Tables.orders(spark, sfDir).select("o_custkey").distinct().count()
    assert(total === nCust)
    val singles = Tables.orders(spark, sfDir).groupBy("o_custkey")
      .agg(count(lit(1)).as("k")).filter(col("k") === 1).count()
    val nones = out.filter(col("prev") === "(none)")
      .agg(coalesce(sum("n_customers"), lit(0L))).head.getLong(0)
    assert(nones === singles, "single-order customers must land in the (none) prior bucket")
  }

  test("x151 mini-dimension: surrogate keys are dense 1..N, profiles " +
       "partition the customer dim, and the revenue rollup conserves") {
    val out = Warehouse.queries("x151_minidim")(spark, sfDir).collect()
    val keys = out.map(_.getAs[Int]("profile_key")).sorted
    assert(keys.toSeq === (1 to out.length), "surrogate keys must be dense ordinals")
    val nCust = out.map(_.getAs[Long]("n_customers")).sum
    assert(nCust === Tables.customer(spark, sfDir).count(),
      "profiles must partition the customer dimension")
    val nOrders = out.map(_.getAs[Long]("n_orders")).sum
    assert(nOrders === Tables.orders(spark, sfDir).count(),
      "every order must reach exactly one profile")
  }

  test("x152 role-playing: both calendar roles broadcast and the matrix " +
       "conserves the item count") {
    val df = Warehouse.queries("x152_role_playing")(spark, sfDir)
    def bhjOf(p: org.apache.spark.sql.execution.SparkPlan): Int = p.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        bhjOf(a.executedPlan)
      case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => 1
    }.sum
    val bhj = bhjOf(df.queryExecution.executedPlan)
    assert(bhj >= 2, s"expected both date-role joins to broadcast, got $bhj")
    val items = df.agg(sum("n_items")).head.getLong(0)
    assert(items === Tables.lineitem(spark, sfDir).count(),
      "two-role calendar join must not drop or duplicate fact rows")
  }
}
