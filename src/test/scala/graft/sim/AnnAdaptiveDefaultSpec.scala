package graft.sim

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Round-15 pins for the adaptive-by-default ANN geometry (the r14
  * verdict's one weak row: the registered full-corpus row shipped fixed
  * 32-plane geometry, candidates ∝ n²/buckets on any corpus that
  * outgrows its bucket count). [[Similarity.annTopK]] and
  * [[Similarity.annTopKBounded]] now default `numPlanes` to the
  * [[Similarity.AdaptiveGeometry]] sentinel: width resolves from one
  * corpus count with the same float-free arithmetic the generated
  * oracles replay from their own count(*). */
class AnnAdaptiveDefaultSpec extends SparkSpecBase {
  import spark.implicits._

  test("adaptivePlanes pins at the gate operating points (hand-computed)") {
    // smallest w with targetBucket·2^w ≥ n, clamped to [8, 15], ×4 bands
    assert(Similarity.adaptivePlanes(500) === 32)         // sf0.01: w=5 → floor 8
    assert(Similarity.adaptivePlanes(500, 4, 4) === 32)   // x35 @ sf0.01: w=7 → floor 8
    assert(Similarity.adaptivePlanes(2000) === 32)        // sf0.1: w=7 → floor 8
    assert(Similarity.adaptivePlanes(2000, 4, 4) === 36)  // x35 @ sf0.1: w=9 — diverges
    assert(Similarity.adaptivePlanes(20000) === 44)       // sf1 replica: w=11
    assert(Similarity.adaptivePlanes(20000, 4, 4) === 52) // x35 @ sf1: w=13
  }

  // a corpus big enough that the resolved width (w=9, 36 planes) EXCEEDS
  // the 8-bit floor — below 4097 rows the adaptive default coincides
  // with the old fixed 32-plane geometry and proves nothing new
  private lazy val bigCorpus = {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 4500L).map { i =>
      if (i == 4401L || i == 4402L) // planted exact clone pair
        (i, Array(9.0f, 1.0f, -3.0f, 2.0f))
      else (i, Array.fill(4)(rnd.nextFloat() * 2f - 1f))
    }
    rows.toDF("vec_id", "embedding").repartition(8).cache()
  }

  test("the default geometry IS adaptivePlanes(n): sentinel ≡ explicit width, bit-for-bit") {
    assert(Similarity.adaptivePlanes(4500) === 36)
    val byDefault = Similarity.annTopK(bigCorpus, 4, 3)
      .select("qid", "vb", "cos", "rank").as[(Long, Long, Double, Int)].collect().toSet
    val explicit = Similarity.annTopK(bigCorpus, 4, 3, numPlanes = 36)
      .select("qid", "vb", "cos", "rank").as[(Long, Long, Double, Int)].collect().toSet
    assert(byDefault.nonEmpty)
    assert(byDefault === explicit)
    // planted positive: the clone pair must surface as each other's
    // rank-1 neighbour at exactly cos 1.0 under the resolved geometry
    assert(byDefault.contains((4401L, 4402L, 1.0, 1)))
    assert(byDefault.contains((4402L, 4401L, 1.0, 1)))
  }

  test("annTopKBounded's default resolves the same width: unreachable cap ≡ annTopK above the floor") {
    // the r14 identity pin ran at n≈150 where every geometry clamps to
    // the floor; this re-proves it in the regime where the two defaults
    // must agree on a RESOLVED (non-floor) width to coincide
    val bounded = Similarity.annTopKBounded(bigCorpus, 4, 3, Int.MaxValue)
      .select("qid", "vb", "cos", "rank").as[(Long, Long, Double, Int)].collect().toSet
    val plain = Similarity.annTopK(bigCorpus, 4, 3)
      .select("qid", "vb", "cos", "rank").as[(Long, Long, Double, Int)].collect().toSet
    assert(bounded.nonEmpty)
    assert(bounded === plain)
  }
}
