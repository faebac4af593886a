package graft.dedup

import graft.SparkSpecBase
import graft.Tables
import org.apache.spark.sql.functions._

/** Pins the asymmetric semantics of Broder containment — the case the
  * synthetic corpus does not exercise (its near-dups are symmetric):
  * a short document fully quoted inside a long one must surface on
  * containment while staying invisible to any Jaccard cut. */
class ContainmentSpec extends SparkSpecBase {
  import spark.implicits._

  test("a strict quote scores c_ab = 1.0 while jaccard stays below any useful cut") {
    // B: 40 distinct tokens; A: a 6-token verbatim excerpt of B.
    // A's 4 shingles are all in B's 38 => c(A->B) = 1, j = 4/38 ≈ 0.105
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val quote = (10 to 15).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, quote), (2L, long)).toDF("doc_id", "text")
    val sh = Dedup.docShingles(docs)

    val cont = Dedup.containmentPairs(sh, 0.9).collect()
    assert(cont.length === 1)
    val r = cont.head
    assert((r.getLong(0), r.getLong(1)) === (1L, 2L))
    assert(r.getDouble(2) === 1.0)            // c_ab: all of A inside B
    assert(r.getDouble(3) < 0.2)              // c_ba: B mostly not in A
    assert(Dedup.jaccardPairs(sh, 0.5).count() === 0,
      "the quote must be invisible to the symmetric cut")
  }

  test("jaccard pairs are a subset of containment pairs at the same threshold") {
    // max(c_ab, c_ba) >= jaccard always (the union bounds both sides),
    // so every jaccard survivor must survive containment too
    val sh = Dedup.docShingles(Tables.documents(spark, sfDir)).cache()
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val j = pairs(Dedup.jaccardPairs(sh, 0.5))
    val c = pairs(Dedup.containmentPairs(sh, 0.5))
    assert(j.nonEmpty && j.subsetOf(c))
  }

  test("containment scores are in (0, 1] in both directions") {
    val sh = Dedup.docShingles(Tables.documents(spark, sfDir))
    val bad = Dedup.containmentPairs(sh, 0.5)
      .filter(col("c_ab") <= 0 || col("c_ab") > 1 || col("c_ba") <= 0 || col("c_ba") > 1)
    assert(bad.count() === 0)
  }
}
