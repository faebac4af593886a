package graft.util

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class CmsSpec extends SparkSpecBase {
  import spark.implicits._

  // 400 keys in 256 buckets: pigeonhole guarantees collisions, so the
  // one-sided error is exercised, never just the exact path
  private def counts = (0 until 400).map(i => (s"key$i", (i + 1).toLong))
    .toDF("tok", "cnt")

  test("CMS is one-sided: est >= exact for every key, and collisions do occur") {
    val ctrs = Cms.counters(counts, "tok", "cnt")
    val est = Cms.estimate(counts.select("tok"), ctrs, "tok")
      .join(counts, Seq("tok"))
    assert(est.filter(col("est") < col("cnt")).count() === 0)
    assert(est.filter(col("est") > col("cnt")).count() > 0,
      "400 keys in 256 buckets must overcount somewhere")
  }

  test("mass conservation: every hash row's counters sum to the total count") {
    val total = counts.agg(sum("cnt")).first().getLong(0)
    val perRow = Cms.counters(counts, "tok", "cnt")
      .groupBy("i").agg(sum("c").as("rowTotal"))
      .select("rowTotal").as[Long].collect().toSeq
    assert(perRow.size === Cms.Depth)
    assert(perRow.forall(_ === total))
  }

  test("estimates are deterministic under repartitioning") {
    val a = Cms.estimate(counts.select("tok"),
      Cms.counters(counts, "tok", "cnt"), "tok").orderBy("tok").collect().toSeq
    val b = Cms.estimate(counts.repartition(7).select("tok"),
      Cms.counters(counts.repartition(5), "tok", "cnt"), "tok")
      .orderBy("tok").collect().toSeq
    assert(a === b)
  }
}
