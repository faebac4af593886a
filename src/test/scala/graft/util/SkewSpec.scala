package graft.util

import graft.SparkSpecBase
import graft.Tables
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpecBase {

  private lazy val orders = Tables.orders(spark, sfDir)
  private lazy val customer = Tables.customer(spark, sfDir)

  test("saltedJoin returns exactly the rows of the plain equi-join") {
    val plain = orders.join(customer, orders("o_custkey") === customer("c_custkey"))
      .select("o_orderkey", "c_custkey").orderBy("o_orderkey")
    val salted = Skew.saltedJoin(orders, customer, "o_custkey", "c_custkey", 4)
      .select("o_orderkey", "c_custkey").orderBy("o_orderkey")
    assert(salted.count() === plain.count())
    assert(salted.except(plain).count() === 0)
    assert(plain.except(salted).count() === 0)
  }

  test("twoPhaseDistinct equals countDistinct per key") {
    val direct = orders.groupBy("o_custkey")
      .agg(countDistinct("o_orderstatus").as("distinct_o_orderstatus"))
    val phased = Skew.twoPhaseDistinct(orders, "o_custkey", "o_orderstatus")
    assert(phased.except(direct).count() === 0)
    assert(direct.except(phased).count() === 0)
  }

  test("keyHistogram buckets partition the key space and conserve row mass") {
    val hist = Skew.keyHistogram(orders, "o_custkey").collect()
    val totalRows = orders.count()
    val totalKeys = orders.select("o_custkey").distinct().count()
    assert(hist.map(_.getAs[Long]("sum_rows")).sum === totalRows)
    assert(hist.map(_.getAs[Long]("n_keys")).sum === totalKeys)
    hist.foreach { r =>
      val b = r.getAs[Int]("log2_bucket")
      val lo = 1L << b; val hi = 1L << (b + 1)
      assert(r.getAs[Long]("min_rows") >= lo && r.getAs[Long]("max_rows") < hi,
        s"bucket $b bounds violated: $r")
    }
  }

  test("q_skew_plain ≡ q_skew_salted, and both actually shuffle (no broadcast escape)") {
    val plain = graft.queries.Relational.queries("q_skew_plain")(spark, sfDir)
    val salted = graft.queries.Relational.queries("q_skew_salted")(spark, sfDir)
    assert(plain.collect().map(_.toString).toSeq ===
           salted.collect().map(_.toString).toSeq)
    Seq("plain" -> plain, "salted" -> salted).foreach { case (n, df) =>
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("ShuffledHashJoin"),
        s"$n must keep the shuffled strategy the 100 TB regime forces:\n$p")
      assert(!p.contains("BroadcastHashJoin"),
        s"$n silently broadcast — the skew demo measures nothing:\n$p")
    }
    // the salted join key really is (key, salt): both columns in the join
    val saltedPlan = salted.queryExecution.executedPlan.toString
    assert(saltedPlan.contains("__salt"), s"salt column missing from plan:\n$saltedPlan")
  }

  test("twoPhaseCollectSet equals the sorted plain collect_set per key") {
    val direct = orders.groupBy("o_custkey")
      .agg(array_sort(collect_set("o_orderstatus")).as("set_o_orderstatus"))
    val phased = Skew.twoPhaseCollectSet(orders, "o_custkey", "o_orderstatus", 4)
    assert(phased.except(direct).count() === 0)
    assert(direct.except(phased).count() === 0)
  }
}
