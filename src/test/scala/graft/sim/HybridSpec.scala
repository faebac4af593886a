package graft.sim

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class HybridSpec extends SparkSpecBase {

  import spark.implicits._

  test("rrfFuse sums reciprocal ranks; single-list candidates survive with rank 0 on the other side") {
    val lex = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("qid", "cand", "rank")
    val vec = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("qid", "cand", "rank")
    val out = Hybrid.rrfFuse(lex, vec, 10)
      .select("cand", "lex_rank", "vec_rank", "rrf", "final_rank")
      .as[(Long, Int, Int, Long, Int)].collect().sortBy(_._5)
    // 1e6 div 61 = 16393, 1e6 div 62 = 16129
    assert(out.toSeq === Seq(
      (11L, 2, 1, 16393L + 16129L, 1),
      (10L, 1, 0, 16393L, 2),
      (12L, 0, 2, 16129L, 3)))
  }

  test("rrfFuse keeps only the top k per query") {
    val lex = (1 to 30).map(i => (1L, i.toLong, i)).toDF("qid", "cand", "rank")
    val vec = spark.emptyDataset[(Long, Long, Int)].toDF("qid", "cand", "rank")
    val out = Hybrid.rrfFuse(lex, vec, 5)
    assert(out.count() === 5)
    // lexical order preserved when the vector list is empty
    assert(out.orderBy("final_rank").select("cand").as[Long].collect().toSeq
      === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("lexicalTopK counts shared tokens and the df-cap drops stop tokens") {
    val docs = Seq(
      (0L, "apple banana cherry"),
      (1L, "apple banana durian"),
      (2L, "apple fig grape")).toDF("doc_id", "text")
    // dfCap=2: "apple" (df=3) is capped out, so doc 2 shares nothing
    val out = Hybrid.lexicalTopK(docs, col("doc_id") < 1, k = 10, dfCap = 2)
      .select("qid", "cand", "overlap").as[(Long, Long, Long)].collect()
    assert(out.toSeq === Seq((0L, 1L, 1L)))
  }
}
