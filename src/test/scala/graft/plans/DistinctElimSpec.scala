package graft.plans

import graft.SparkSpecBase
import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Deduplicate
import org.apache.spark.sql.functions._

/** Pins the distinct-elimination contract (X166): a Deduplicate whose
  * keys cover a declared unique key of the base (through pruning
  * Projects / Filters) is dropped with values unchanged; it stays when
  * the keys don't cover the declared key, when no key is declared for
  * the base, or when a computed projection intervenes. */
class DistinctElimSpec extends SparkSpecBase {

  private def dedups(df: DataFrame): Int =
    df.queryExecution.analyzed.collect { case d: Deduplicate => d }.size

  test("distinct covering the declared PK is dropped; values unchanged") {
    val o = Tables.orders(spark, sfDir)
    val uk = DistinctElim.unique(o, "o_orderkey")
    val q = o.select("o_orderkey", "o_custkey", "o_orderpriority")
      .filter(col("o_custkey") % 2 === 0)
      .distinct()
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    val routed = DistinctElim(spark, q, Seq(uk))
    assert(dedups(routed) == 0, "covered Deduplicate must be dropped")
    assert(routed.orderBy("o_orderpriority").collect().map(_.toString).toSeq ==
      q.orderBy("o_orderpriority").collect().map(_.toString).toSeq)
  }

  test("blocked: keys don't cover the PK / undeclared base / computed projection") {
    val o = Tables.orders(spark, sfDir)
    val uk = DistinctElim.unique(o, "o_orderkey")

    val notCovered = o.select("o_custkey", "o_orderpriority").distinct()
    assert(dedups(DistinctElim(spark, notCovered, Seq(uk))) == 1,
      "a distinct set without the key is a REAL dedup and must stay")

    val otherBase = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_mktsegment").distinct()
    assert(dedups(DistinctElim(spark, otherBase, Seq(uk))) == 1,
      "no declared key for this base: must stay")

    val computed = o.select(col("o_orderkey"),
        (col("o_custkey") % 10).as("bucket")).distinct()
    assert(dedups(DistinctElim(spark, computed, Seq(uk))) == 1,
      "a computed projection between distinct and base must block")
  }
}
