package graft.queries

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Plan + semantics pins for the round-9 TPC-H subquery closures
  * (Q20 → j17, Q2 → j18, Q13 → j19). The oracle hash-gate proves the
  * VALUES match the correlated SQL; these pins prove the PLANS are the
  * decorrelated shapes the scaladocs claim — one fact scan, semi-join
  * chains, residual-in-condition — so a regression back to a naive
  * re-correlated or post-filtered plan fails loudly. */
class TpchSubquerySpec extends SparkSpecBase {

  private def planOf(name: String): String =
    Relational.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  private def lineitemScans(plan: String): Int =
    "lineitem\\.parquet".r.findAllIn(plan).length

  test("j17: both correlated aggregates decorrelate into ONE lineitem scan + semi-join chain") {
    val plan = planOf("j17_excess_parts")
    assert(lineitemScans(plan) === 1,
      s"the all-time and 1997 aggregates must share one fact scan:\n$plan")
    assert("LeftSemi".r.findAllIn(plan).length === 2,
      s"expected the nation gate + qualifying-pairs chain as two semi joins:\n$plan")
    // the dim filters must reach their parquet scans, not evaluate post-scan
    assert(plan.contains("StringStartsWith(p_name,small)"),
      s"part-name prefix not pushed:\n$plan")
    assert(plan.contains("EqualTo(r_name,EUROPE)"),
      s"region filter not pushed:\n$plan")
  }

  test("j17: qualifying pairs respect the excess rule against a direct recompute") {
    val qdec = col("l_quantity").cast("decimal(18,2)")
    val pairs = Tables.lineitem(spark, sfDir)
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(qdec).as("avail"),
        sum(when(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
                 col("l_shipdate") < lit("1998-01-01").cast("timestamp"), qdec)
          .otherwise(lit(0).cast("decimal(18,2)"))).as("q97"))
      .filter(col("q97") > 0 && col("avail") > col("q97") * 2)
      .join(Tables.part(spark, sfDir).filter(col("p_name").like("small%")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .select("l_suppkey").distinct()
    val euro = Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir)
          .join(Tables.region(spark, sfDir).filter(col("r_name") === "EUROPE"),
            col("n_regionkey") === col("r_regionkey")),
        col("s_nationkey") === col("n_nationkey"), "left_semi")
    val expect = euro.join(pairs, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val got = Relational.queries("j17_excess_parts")(spark, sfDir)
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    assert(got === expect)
  }

  test("j18: every output row's cost is the true min over region suppliers of its part") {
    val out = Relational.queries("j18_min_cost_supplier")(spark, sfDir)
    val plan = planOf("j18_min_cost_supplier")
    assert(lineitemScans(plan) === 1,
      s"the correlated MIN must ride the same (part,supp) agg, not a second scan:\n$plan")
    assert(plan.contains("Window"), s"expected the window decorrelation:\n$plan")
    // recompute the per-part min over AMERICA suppliers and check every row
    val cost = Tables.lineitem(spark, sfDir)
      .groupBy("l_partkey", "l_suppkey").agg(min("l_extendedprice").as("c"))
    val america = Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir)
          .join(Tables.region(spark, sfDir).filter(col("r_name") === "AMERICA"),
            col("n_regionkey") === col("r_regionkey")),
        col("s_nationkey") === col("n_nationkey"), "left_semi")
    val minPerPart = cost
      .join(america, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("l_partkey").agg(min("c").as("true_min"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = out.select("p_partkey", "cost").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) === minPerPart(r.getLong(0)),
        s"part ${r.getLong(0)}: cost ${r.getDouble(1)} != min ${minPerPart(r.getLong(0))}")
    }
  }

  test("j20: Dataset LEFT ANTI ≡ the SQL NOT IN form (non-null key), anti before part join") {
    val api = Relational.queries("j20_supplier_part_counts")(spark, sfDir)
    Tables.registerAll(spark, sfDir)
    // the same query through the SQL entry point, NOT IN text intact —
    // Spark plans the null-aware variant from this form; with a
    // non-nullable key both must produce identical rows
    val sql = spark.sql(
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
         FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
         JOIN part ON p_partkey = l_partkey
         WHERE p_brand <> 'Brand#3' AND p_type NOT LIKE 'PROMO%'
           AND p_size IN (5, 10, 15, 20, 25, 30)
           AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         GROUP BY 1, 2, 3
         ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")
    assert(api.collect().map(_.toString).toSeq === sql.collect().map(_.toString).toSeq)
    val plan = api.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"NOT IN must plan as an anti join:\n$plan")
  }

  test("j21: the scalar-subquery aggregate reuses the outer aggregate's exchange") {
    val df = Relational.queries("j21_part_value_share")(spark, sfDir)
    df.queryExecution.toRdd.count()
    // pre-AQE the identical partial-agg exchanges appear twice; at
    // runtime stage reuse must collapse them so the fact shuffles once
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(plan.contains("ReusedQueryStage") || plan.contains("ReusedExchange"),
      s"expected the duplicated partial-agg exchange to be reused:\n$plan")
  }

  test("j19: LEFT OUTER survives, residual stays in the join (zero-count customers kept)") {
    val df = Relational.queries("j19_order_distribution")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftOuter"), s"outer join must not degrade to inner:\n$plan")
    // a post-JOIN filter on the priority would delete null-extended rows;
    // the predicate must sit below/inside the join, never above it
    val joinIdx = plan.indexOf("Join")
    val filterAbove = plan.take(joinIdx).contains("URGENT")
    assert(!filterAbove, s"priority predicate found above the join:\n$plan")
    // distribution must partition the customer table exactly
    val dist = df.collect()
    val totalCustomers = Tables.customer(spark, sfDir).count()
    assert(dist.map(_.getAs[Long]("custdist")).sum === totalCustomers)
    // customers whose every order is URGENT (or who have none) land in c_count=0
    val zeroExpected = Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
          .filter(!col("o_orderpriority").like("%URGENT%")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    val zeroGot = dist.filter(_.getAs[Long]("c_count") == 0L)
      .map(_.getAs[Long]("custdist")).headOption.getOrElse(0L)
    assert(zeroGot === zeroExpected,
      s"zero-order customers: got $zeroGot expected $zeroExpected")
  }
}
