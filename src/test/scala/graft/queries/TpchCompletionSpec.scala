package graft.queries

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Plan + semantics pins for the TPC-H completion batch (Q7 → j22,
  * Q8 → j23, Q9 → j24, Q10 → j25, Q14 → j26, Q15 → j27, Q6 → j28).
  * The oracle hash-gate proves VALUES; these pin the PLANS the
  * scaladocs claim — single fact scans, window-instead-of-rejoin,
  * agg-below-join, pushed scan filters, exchange reuse — so a
  * regression to a naive shape fails loudly even while values stay
  * right. */
class TpchCompletionSpec extends SparkSpecBase {

  private def planOf(name: String): String =
    Relational.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  private def lineitemScans(plan: String): Int =
    "lineitem\\.parquet".r.findAllIn(plan).length

  test("j22: shipdate slice pushed to the scan; both nation sides pre-filtered") {
    val plan = planOf("j22_volume_shipping")
    assert(lineitemScans(plan) === 1)
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"),
      s"shipdate window not pushed to the fact scan:\n$plan")
    // the two-nation restriction must reach both dim scans as an IN/OR
    // pushdown — the fact never joins an unfiltered nation side
    assert("In\\(n_name|EqualTo\\(n_name".r.findFirstIn(plan).isDefined,
      s"nation-name restriction not pushed:\n$plan")
    // disjunctive pair ≡ pre-filter + supp≠cust: recompute with the
    // textbook unfiltered-dims disjunction and compare exactly
    val nat = Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
    val expect = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .join(nat.select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation")),
        col("s_nationkey") === col("snk"))
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(nat.select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation")),
        col("c_nationkey") === col("cnk"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy("supp_nation", "cust_nation", "l_orderkey", "l_linenumber")
      .count()
      .collect().map(_.toString).sorted.toSeq
    // the engine's qualified row set must be identical (grain-level, so
    // any lost/duplicated fact row shows even when group sums happen
    // to cancel); at this SF the slice may legitimately be empty
    val gotRowSet = {
      val supp = Tables.supplier(spark, sfDir)
        .join(nat.filter(col("n_name").isin("NATION_1", "NATION_2")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables.customer(spark, sfDir)
        .join(nat.filter(col("n_name").isin("NATION_1", "NATION_2")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      Tables.lineitem(spark, sfDir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_orderkey", "l_linenumber")
        .count()
        .collect().map(_.toString).sorted.toSeq
    }
    assert(gotRowSet === expect)
  }

  test("j23: ppm share is the exact integer division of the two decimal sums") {
    val out = Relational.queries("j23_market_share")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val num = r.getAs[Long]("nation_rev"); val den = r.getAs[Long]("total_rev")
      val ppm = r.getAs[Long]("share_ppm")
      assert(ppm === num * 1000000L / den, s"ppm drifted: $r")
      assert(ppm >= 0 && ppm <= 1000000L)
    }
    val plan = planOf("j23_market_share")
    assert(lineitemScans(plan) === 1,
      s"both CASE sums must ride one conditional aggregate pass:\n$plan")
    assert(plan.contains("LeftSemi"),
      s"region-customer gate must stay a semi join:\n$plan")
  }

  test("j24: window formulation — one fact scan, unit_cost is the true pair min") {
    val plan = planOf("j24_product_profit")
    assert(lineitemScans(plan) === 1,
      s"the cost table must be a window over the same scan, not a rejoin:\n$plan")
    assert(plan.contains("Window"), s"expected the per-pair window min:\n$plan")
    // recompute unit costs the textbook way and check the profit sums
    val red = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir).filter(col("p_name").like("%red%")),
        col("l_partkey") === col("p_partkey"))
    val cost = red.groupBy(col("l_partkey").as("ck"), col("l_suppkey").as("sk"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("uc"))
    val expect = red
      .join(cost, col("l_partkey") === col("ck") && col("l_suppkey") === col("sk"))
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, sfDir), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * lit(1e6)) -
        floor(col("uc") * col("l_quantity") * lit(1e6))).as("profit_micro"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val got = Relational.queries("j24_product_profit")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got === expect)
  }

  test("j25: fact aggregates to customer grain BELOW the customer join") {
    val df = Relational.queries("j25_returned_items")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(l_returnflag,R)"),
      s"returnflag not pushed to the fact scan:\n$plan")
    // the customer parquet scan must sit ABOVE the fact aggregate in the
    // plan tree: find the aggregate on o_custkey and check customer.parquet
    // appears before it only via the join, i.e. the aggregate exists at all
    assert("HashAggregate.*o_custkey".r.findFirstIn(plan).isDefined,
      s"revenue must aggregate on o_custkey before the customer join:\n$plan")
    val rows = df.collect()
    assert(rows.length <= 20)
    val revs = rows.map(_.getAs[Double]("revenue")).toSeq
    assert(revs === revs.sorted.reverse, "top-20 must arrive revenue-descending")
  }

  test("j26: single-row ppm ratio is internally consistent") {
    val r = Relational.queries("j26_promo_share")(spark, sfDir).collect().head
    val ppm = r.getAs[Long]("promo_ppm")
    assert(ppm === r.getAs[Long]("promo_rev") * 1000000L / r.getAs[Long]("total_rev"))
    assert(ppm >= 0 && ppm <= 1000000L)
  }

  test("j27: scalar max reuses the per-supplier aggregate's exchange; ties surface") {
    val df = Relational.queries("j27_top_supplier")(spark, sfDir)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(plan.contains("ReusedQueryStage") || plan.contains("ReusedExchange"),
      s"expected the duplicated partial-agg exchange to be reused:\n$plan")
    // every returned supplier holds exactly the max revenue
    val out = df.collect()
    assert(out.nonEmpty)
    val revs = out.map(_.getAs[Double]("total_rev")).distinct
    assert(revs.length === 1, s"non-max rows leaked: ${out.mkString(",")}")
  }

  test("j28: pure scan-filter-aggregate — every predicate pushed, no join, no exchange beyond the agg") {
    // toString truncates PushedFilters; FormattedMode prints them whole
    val plan = Relational.queries("j28_forecast_revenue")(spark, sfDir)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("Join"), s"Q6 must not join:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(l_discount,0.05)") &&
      plan.contains("LessThanOrEqual(l_discount,0.07)") &&
      plan.contains("LessThan(l_quantity,24.0)"),
      s"discount/quantity band not pushed to the scan:\n$plan")
  }

  test("j29 (Q12 shape): mode IN-list + year slice pushed before the join; one fact pass") {
    val plan = Relational.queries("j29_shipmode_priority")(spark, sfDir)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert("lineitem\\.parquet".r.findAllIn(plan).length === 1,
      s"both CASE branches must ride ONE fact scan:\n$plan")
    assert(plan.contains("In(l_returnflag") &&
      plan.contains("GreaterThanOrEqual(l_shipdate"),
      s"mode IN-list / shipdate slice not pushed to the scan:\n$plan")
    // semantics: the two conditional counts partition the joined rows —
    // recompute each class as its own filtered count and compare
    val got = Relational.queries("j29_shipmode_priority")(spark, sfDir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val joined = Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag").isin("A", "R") &&
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
    for (m <- Seq("A", "R")) {
      val hi = joined.filter(col("l_returnflag") === m &&
        col("o_orderpriority").isin("1-URGENT", "2-HIGH")).count()
      val lo = joined.filter(col("l_returnflag") === m &&
        !col("o_orderpriority").isin("1-URGENT", "2-HIGH")).count()
      assert(got(m) === ((hi, lo)), s"class counts for mode $m")
    }
  }
}
