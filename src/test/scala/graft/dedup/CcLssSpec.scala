package graft.dedup

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.DataFrame

/** Pins large-star/small-star CC against the min-label fixpoint: same
  * components (root = component minimum) on a clique, a long chain,
  * and the real gate pair plane — and the ROUND count on the chain is
  * logarithmic where min-label would pay one round per hop.
  */
class CcLssSpec extends SparkSpecBase {
  import spark.implicits._

  private def comps(labels: DataFrame): Set[(Long, Long)] =
    labels.select("doc_id", "component").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("LSS ≡ fixpoint min-label on a 33-node chain, in logarithmic rounds") {
    val pairs = (0 until 32).map(i => (i.toLong, i + 1L)).toDF("doc_a", "doc_b")
    val docs = (0L to 32L).toDF("doc_id")
    val (lss, rounds) = Dedup.ccLargeStarSmallStar(pairs, docs, maxRounds = 40)
    val fix = Dedup.nearDupComponentsFixpoint(pairs, docs, maxIters = 50)
    assert(comps(lss) === comps(fix))
    // diameter 32: min-label needs 32 hops; star contraction halves
    // path lengths per round — ⌈log₂ 32⌉ + convergence-detect slack
    assert(rounds <= 8, s"chain took $rounds rounds — not logarithmic")
  }

  test("LSS ≡ fixpoint on a clique and on disjoint components") {
    val clique = (for {
      i <- 10L to 17L; j <- 10L to 17L if i < j
    } yield (i, j)).toDF("doc_a", "doc_b")
    val second = Seq((30L, 31L), (31L, 32L)).toDF("doc_a", "doc_b")
    val pairs = clique.unionByName(second)
    val docs = ((10L to 17L) ++ (30L to 32L) ++ Seq(99L)).toDF("doc_id")
    val (lss, _) = Dedup.ccLargeStarSmallStar(pairs, docs)
    val fix = Dedup.nearDupComponentsFixpoint(pairs, docs)
    assert(comps(lss) === comps(fix))
    // the isolated doc labels itself
    assert(comps(lss).contains((99L, 99L)))
  }

  test("LSS ≡ fixpoint on the real gate pair plane") {
    val docs = Tables.documents(spark, sfDir)
    val pairs = Dedup.minhashNearDups(docs, 0.5)
    val (lss, _) = Dedup.ccLargeStarSmallStar(pairs, docs)
    val fix = Dedup.nearDupComponentsFixpoint(pairs, docs)
    assert(comps(lss) === comps(fix))
  }
}
