package graft.operators

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Probes the plan fingerprint + validity token from both sides:
  * independent builds of the same logical query HIT; a changed
  * literal, a changed column set, a different source, and — the
  * validity case — the SAME path with NEW data all MISS; a hit serves
  * the identical materialized rows; the store is bounded. */
class ResultCacheSpec extends SparkSpecBase {

  private def rollup(filterVal: String) =
    Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") =!= filterVal)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))

  test("independent builds of the same query hit; any change misses") {
    ResultCache.clear()
    val (firstDf, hit0) = ResultCache.through(rollup("X"))
    val first = firstDf.collect()
    assert(!hit0 && ResultCache.size == 1)
    val (second, hit1) = ResultCache.through(rollup("X")) // fresh scan, fresh exprIds
    assert(hit1, "same logical plan must fingerprint identically")
    assert(second.collect().toSeq == first.toSeq, "a hit serves the same rows")

    assert(!ResultCache.through(rollup("Y"))._2, "a changed literal must miss")
    assert(!ResultCache.through(rollup("X").withColumn("extra", lit(1)))._2,
      "a changed column set must miss")
    assert(!ResultCache.through(
      Tables.customer(spark, sfDir).groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n")))._2,
      "a different source must miss")
    assert(ResultCache.size == 4)
  }

  test("same path + new data misses (source-snapshot validity)") {
    ResultCache.clear()
    val dir = java.nio.file.Files.createTempDirectory("graft_rc_src_").toString
    Tables.orders(spark, sfDir).limit(100)
      .write.mode("overwrite").parquet(dir)
    def q = spark.read.parquet(dir)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    val (served0, h0) = ResultCache.through(q)
    assert(!h0)
    val n0 = served0.agg(sum("n")).collect()(0).getLong(0)
    assert(ResultCache.through(q)._2, "unchanged source must still hit")
    // append rows under the SAME path — the stale-serve hazard
    Tables.orders(spark, sfDir).limit(50)
      .write.mode("append").parquet(dir)
    val (served1, h1) = ResultCache.through(q)
    assert(!h1, "same path with appended data must MISS, not serve stale rows")
    assert(served1.agg(sum("n")).collect()(0).getLong(0) === n0 + 50)
  }

  test("a vanished source file recomputes as a MISS instead of throwing") {
    ResultCache.clear()
    val dir = java.nio.file.Files.createTempDirectory("graft_rc_del_").toString
    Tables.orders(spark, sfDir).limit(100).repartition(2)
      .write.mode("overwrite").parquet(dir)
    def q = spark.read.parquet(dir)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    val plan = q // capture a frame whose file listing predates the delete
    assert(!ResultCache.through(plan)._2)
    // compaction/vacuum between planning and the next serve: one part
    // file disappears under the same path
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    assert(part.delete())
    val (served, hit) = ResultCache.through(plan)
    assert(!hit, "a deleted input file must token as changed and MISS")
    served.collect() // and the recompute must be servable, not a throw
    ResultCache.clear()
  }

  test("the store is bounded: old entries evict past maxEntries") {
    ResultCache.clear()
    val base = Tables.orders(spark, sfDir)
    (0 to ResultCache.maxEntries).foreach { i =>
      ResultCache.through(base.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), lit(i).as("tag")))
    }
    assert(ResultCache.size <= ResultCache.maxEntries,
      "insertions beyond the bound must evict, not grow without limit")
    ResultCache.clear()
  }
}
