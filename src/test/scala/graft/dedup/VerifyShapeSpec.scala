package graft.dedup

import graft.{SparkSpecBase, Tables}

/** Pin for the r16 verify restructure: [[Dedup.verifiedPairsArrays]]
  * (per-pair array_intersect over per-doc shingle arrays — the
  * large-candidate shape x81/x54 run) must return EXACTLY the rows of
  * the explode-shape [[Dedup.verifiedPairs]], jaccard bit-for-bit,
  * on the same candidate set. The oracle gate proves each query's end
  * result; this pins the two shapes against each other directly so a
  * future edit to either can't silently diverge them. */
class VerifyShapeSpec extends SparkSpecBase {

  test("array-intersect verify equals explode verify exactly (LSH candidates)") {
    val docs = Tables.documents(spark, sfDir)
    val sh = Dedup.docShingles(docs).cache()
    val cand = Dedup.candidatePairs(Dedup.bandTable(Dedup.minhashSignatures(sh))).cache()
    assert(cand.count() > 0, "test data should produce LSH candidates")
    val explode = Dedup.verifiedPairs(sh, cand, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val arrays = Dedup.verifiedPairsArrays(sh, cand, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(arrays === explode)
    assert(explode.nonEmpty, "test data should contain planted near-dups")
  }

  test("array-intersect verify matches below-threshold behavior too") {
    // a lower threshold keeps more pairs — the two shapes must agree on
    // every jaccard value, not only the ones that clear 0.5
    val docs = Tables.documents(spark, sfDir)
    val sh = Dedup.docShingles(docs).cache()
    val cand = Dedup.candidatePairs(Dedup.bandTable(Dedup.minhashSignatures(sh))).cache()
    val explode = Dedup.verifiedPairs(sh, cand, 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val arrays = Dedup.verifiedPairsArrays(sh, cand, 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(arrays === explode)
  }
}
