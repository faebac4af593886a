package graft.sim

import graft.SparkSpecBase
import graft.Tables
import org.apache.spark.sql.functions._

/** Pins the PQ pipeline faces the oracle's single end-to-end hash
  * cannot isolate: codebook/code-table shape, the full-shortlist
  * brute-force degeneracy, and partition-invariance of the integer ADC
  * stage. */
class PqSpec extends SparkSpecBase {
  import spark.implicits._

  test("pqIndex: one code per (vector, subspace), codes within [0, ks)") {
    val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 100).cache()
    val (centroids, codes) = Similarity.pqIndex(emb)
    val numSub = 64 / Similarity.PqSubDim
    assert(codes.count() === emb.count() * numSub)
    assert(codes.groupBy("vec_id", "sub").count().filter(col("count") =!= 1).count() === 0)
    assert(codes.filter(col("cluster") < 0 || col("cluster") >= Similarity.PqKs).count() === 0)
    // the codebook is bounded index metadata: ≤ numSub·ks·subDim cells
    assert(centroids.count() <= numSub.toLong * Similarity.PqKs * Similarity.PqSubDim)
    centroids.unpersist(); codes.unpersist()
  }

  test("pqTopK with full shortlist is exactly brute force") {
    val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 100).cache()
    val q = emb.filter(col("vec_id") < 5)
    val exact = Similarity.topK(emb, q, 3)
      .select("qid", "vb", "rank").as[(Long, Long, Int)].collect().toSet
    val pq = Similarity.pqTopK(emb, q, 3, shortlist = 200)
      .select("qid", "vb", "rank").as[(Long, Long, Int)].collect().toSet
    assert(pq === exact)
  }

  test("pqTopK with a tight shortlist ranks k neighbours, partition-invariant") {
    val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 200).cache()
    val q = emb.filter(col("vec_id") < 5)
    val res = Similarity.pqTopK(emb, q, 3, shortlist = 10).cache()
    assert(res.groupBy("qid").count().filter(col("count") =!= 3).count() === 0)
    assert(res.filter(col("qid") === col("vb")).count() === 0)
    val res2 = Similarity.pqTopK(emb.repartition(7), q, 3, shortlist = 10)
    assert(res2.select("qid", "vb", "rank").as[(Long, Long, Int)].collect().toSet
      === res.select("qid", "vb", "rank").as[(Long, Long, Int)].collect().toSet)
    res.unpersist()
  }
}
