package graft.text

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpecBase {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "the quick brown fox jumps", "en"),
    (1L, "the quick brown dog runs", "en"),
    (2L, "the quick brown fox sleeps", "xx"), // raw doc sharing target bigrams
    (3L, "zzq qqz zqq qzz zzz", "xx"),        // raw doc sharing none
    (4L, "x", "xx")                            // no bigrams at all
  ).toDF("doc_id", "text", "lang")

  test("target-like documents outscore disjoint ones; no-bigram docs score 0") {
    val res = Dsir.importanceWeights(corpus, col("lang") === "en")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(res.size === 5) // verdict totality
    val score = res.map { case (id, _, s) => id -> s }.toMap
    assert(score(2L) > score(3L),
      s"target-bigram doc should outscore the disjoint doc: $score")
    assert(score(4L) === 0L && res.find(_._1 == 4L).get._2 === 0L)
  }

  test("when the target IS the corpus, every ratio is exactly 1 and all scores are 0") {
    val res = Dsir.importanceWeights(corpus, lit(true))
    assert(res.filter(col("imp_score") =!= 0L).count() === 0)
  }

  test("importance weights are partition-invariant") {
    val a = Dsir.importanceWeights(corpus, col("lang") === "en")
      .orderBy("doc_id").collect().toSeq
    val b = Dsir.importanceWeights(corpus.repartition(5), col("lang") === "en")
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }
}
