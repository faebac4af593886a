package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.execution.FileSourceScanExec

/** Behavior + plan-shape pins for the warehouse-depth tranche
  * (X153-X159). Value correctness is the oracle hash gate's job; these
  * pin the *mechanisms*: inferred members appear then disappear, the
  * accumulating snapshot covers all orders, held FDs report zero
  * violations, the DPP scan carries a runtime pruning filter, top-k
  * sampling plans as TakeOrdered, and the hierarchy resolves to the
  * single root. */
class WarehouseOpsSpec extends SparkSpecBase {

  private def run(name: String) =
    Warehouse.queries.getOrElse(name, TrainingData.queries(name))(spark, sfDir)

  test("x134: revenue migrates out of the (inferred) bucket after backfill") {
    val rows = run("x134_late_dim").collect()
    val placeholder = rows.filter(_.getString(0) == "placeholder")
    val backfilled = rows.filter(_.getString(0) == "backfilled")
    assert(placeholder.exists(r => r.getString(1) == "(inferred)" && r.getLong(3) > 0),
      "placeholder phase must attribute items to the (inferred) member")
    assert(!backfilled.exists(_.getString(1) == "(inferred)"),
      "backfill must eliminate the placeholder bucket")
    assert(placeholder.map(_.getLong(3)).sum == backfilled.map(_.getLong(3)).sum,
      "no fact rows may be dropped in either phase")
  }

  test("x135: accumulating snapshot covers every order exactly once") {
    val rows = run("x135_accum_snapshot").collect()
    val nOrders = rows.map(_.getLong(1)).sum
    assert(nOrders == graft.Tables.orders(spark, sfDir).count())
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1)),
      "n_started cannot exceed n_orders")
  }

  test("x136: key FD holds with zero violations; fact FDs are violated") {
    val rows = run("x136_fd_audit").collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val (keyViol, keyMax) = rows("orders.o_orderkey->o_custkey")
    assert(keyViol == 0 && keyMax == 1, "a key FD must hold exactly")
    assert(rows("lineitem.l_partkey->l_suppkey")._1 > 0,
      "part→supplier must be violated on a multi-supplier fact")
  }

  test("x137: priority sample is ≤k, distinct, and plans as TakeOrdered (no global sort)") {
    val df = run("x137_weighted_sample")
    val rows = df.collect()
    assert(rows.length <= TrainingData.SampleTopK && rows.nonEmpty)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length,
      "without-replacement: no doc repeats")
    val plan = df.queryExecution.sparkPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must plan as TakeOrderedAndProject, got:\n$plan")
  }

  test("x138: the partitioned fact scan carries a dynamic partition pruning filter") {
    val df = run("x138_dpp")
    val scans = df.queryExecution.sparkPlan.collect { case f: FileSourceScanExec => f }
    val pruned = scans.filter(_.partitionFilters.exists(
      _.toString.toLowerCase.contains("dynamicpruning")))
    assert(pruned.nonEmpty,
      "fact scan must carry a DynamicPruningExpression partition filter; scans: " +
        scans.map(s => s.tableIdentifier.toString + " pf=" + s.partitionFilters.mkString(";"))
          .mkString(" | "))
    assert(df.collect().nonEmpty)
    // negative control (non-vacuity): with the rule disabled, the SAME
    // matcher on the SAME query finds nothing — the positive assertion
    // above can only pass because DPP genuinely fired
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
    try {
      val off = run("x138_dpp").queryExecution.sparkPlan
        .collect { case f: FileSourceScanExec => f }
        .filter(_.partitionFilters.exists(
          _.toString.toLowerCase.contains("dynamicpruning")))
      assert(off.isEmpty, "matcher must find no DPP filter when the rule is off")
    } finally
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
  }

  test("x140: the joined fact values survive the bloom prune; the filter is in the plan") {
    // the require() inside the builder already pins injection — reaching
    // collect() proves both the plan shape and that confs were restored
    val rows = run("x140_runtime_filter").collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(2) > 0))
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1",
      "builder must restore the broadcast threshold")
  }

  test("x141: bitmap popcount algebra reproduces the direct group-by exactly") {
    val bitmap = run("x141_bitmap_index").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val direct = graft.Tables.documents(spark, sfDir)
      .groupBy("lang", "source").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(bitmap == direct)
  }

  test("x142: frontier is mutually non-dominated and dominates everything else") {
    val pts = graft.Tables.documents(spark, sfDir)
      .selectExpr("doc_id",
        "cast(size(split(trim(lower(text)), '\\\\s+')) as long) as w",
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as long) as q")
      .filter("w > 0").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def dominated(p: (Long, Long, Long)) = pts.exists(o =>
      o._2 >= p._2 && o._3 >= p._3 && (o._2 > p._2 || o._3 > p._3))
    val want = pts.filterNot(dominated).map(_._1).toSet
    val got = run("x142_skyline").collect().map(_.getLong(0)).toSet
    assert(got == want, s"grid skyline != brute force: extra=${got -- want} missing=${want -- got}")
  }

  test("x144: exactly one balance row per (customer, month); semi-additive rollup") {
    val o = graft.Tables.orders(spark, sfDir)
    val nPairs = o.selectExpr("o_custkey", "date_format(o_orderdate, 'yyyy-MM') as m")
      .distinct().count()
    val rows = run("x144_semi_additive").collect()
    assert(rows.map(_.getLong(1)).sum == nPairs,
      "each (customer, month) contributes exactly one month-end balance")
  }

  test("x145: carried account count is monotone nondecreasing over months") {
    val rows = run("x145_periodic_snapshot").collect() // already month-ordered
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => b >= a },
      "LOCF can only add carried accounts, never lose them")
    assert(counts.last <= graft.Tables.customer(spark, sfDir).count())
  }

  test("x139: hierarchy resolves every customer to the single root with exact depths") {
    val rows = run("x139_hierarchy").collect()
    val depth0 = rows.find(_.getLong(0) == 0L).get
    assert(depth0.getLong(1) == 1L && depth0.getLong(2) == 1L,
      "exactly one root (custkey 0) at depth 0")
    assert(rows.map(_.getLong(1)).sum == graft.Tables.customer(spark, sfDir).count(),
      "closure must cover every node exactly once")
    assert(rows.forall(_.getLong(2) == 1L), "all nodes share the single root")
  }
}
