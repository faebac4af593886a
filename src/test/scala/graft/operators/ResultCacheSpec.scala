package graft.operators

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Probes the plan fingerprint from both sides: independent builds of
  * the same logical query HIT; a changed literal, a changed column
  * set, and a different source all MISS; a hit serves the identical
  * materialized rows. */
class ResultCacheSpec extends SparkSpecBase {

  private def rollup(filterVal: String) =
    Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") =!= filterVal)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))

  test("independent builds of the same query hit; any change misses") {
    ResultCache.clear()
    val first = ResultCache.through(rollup("X")).collect()
    assert(!ResultCache.lastHit && ResultCache.size == 1)
    val second = ResultCache.through(rollup("X")) // fresh scan, fresh exprIds
    assert(ResultCache.lastHit, "same logical plan must fingerprint identically")
    assert(second.collect().toSeq == first.toSeq, "a hit serves the same rows")

    ResultCache.through(rollup("Y")) // literal changed
    assert(!ResultCache.lastHit, "a changed literal must miss")
    ResultCache.through(rollup("X").withColumn("extra", lit(1)))
    assert(!ResultCache.lastHit, "a changed column set must miss")
    ResultCache.through(
      Tables.customer(spark, sfDir).groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n")))
    assert(!ResultCache.lastHit, "a different source must miss")
    assert(ResultCache.size == 4)
  }
}
