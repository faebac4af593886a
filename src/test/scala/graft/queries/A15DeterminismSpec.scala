package graft.queries

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** The premise that lets a15 carry an oracle at all: Spark's HLL++
  * estimate is DETERMINISTIC for a given input set — register merges
  * are element-wise max (commutative, associative), so partitioning
  * cannot change the estimate, only the input set can. With that
  * pinned, the relative-error verdict bit is a stable value an oracle
  * can assert. */
class A15DeterminismSpec extends SparkSpecBase {

  test("approx_count_distinct is invariant under repartitioning") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey")
    val estimates = Seq(li, li.repartition(1), li.repartition(13, col("l_partkey")))
      .map(_.agg(
        approx_count_distinct(col("l_orderkey"), 0.02),
        approx_count_distinct(col("l_partkey"), 0.02)).first())
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(estimates.distinct.size === 1,
      s"HLL estimate changed with partitioning: $estimates")
  }

  test("the 5% verdict bound holds with margin at gate scale") {
    val row = Relational.queries("a15_approx_distinct")(spark, sfDir).first()
    assert(row.getAs[Boolean]("orderkeys_within_5pct"))
    assert(row.getAs[Boolean]("partkeys_within_5pct"))
    // and the exact side agrees with a direct recompute
    val exact = Tables.lineitem(spark, sfDir)
      .agg(countDistinct("l_orderkey"), countDistinct("l_partkey")).first()
    assert(row.getAs[Long]("exact_orderkeys") === exact.getLong(0))
    assert(row.getAs[Long]("exact_partkeys") === exact.getLong(1))
  }
}
