package graft.sim

import graft.SparkSpecBase
import graft.Tables
import org.apache.spark.sql.functions._

/** Pins SemDeDup's verdict semantics: within-cluster lower-id
  * neighbours at cosine ≥ τ drop a vector, everything else keeps, and
  * the verdict covers the corpus exactly once. */
class SemDedupSpec extends SparkSpecBase {
  import spark.implicits._

  test("near-parallel vectors drop to their lowest-id cluster mate") {
    // two directions; 3 and 5 shadow 1, 4 shadows 2
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.9f, 0.1f)),
      (4L, Array(0.1f, 0.9f)),
      (5L, Array(0.89f, 0.11f))).toDF("vec_id", "embedding")
    val v = Similarity.semDedup(emb, 0.9, nlist = 2, iters = 2)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(2))).toSeq
    assert(v === Seq((1L, 1), (2L, 1), (3L, 0), (4L, 0), (5L, 0)))
  }

  test("threshold 1-epsilon keeps everything that is not exactly parallel") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f))).toDF("vec_id", "embedding")
    val kept = Similarity.semDedup(emb, 0.9999, nlist = 2, iters = 1)
      .filter(col("keep") === 1).count()
    assert(kept === 2)
  }

  test("probe over a parquet-persisted assignment table equals the gate form") {
    val emb = Tables.embeddings(spark, sfDir)
    val gate = Similarity.semDedup(emb, 0.3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val (cent, asg) = Similarity.ivfIndex(emb)
    val dir = java.nio.file.Files.createTempDirectory("semdedup-idx").toString
    asg.write.mode("overwrite").parquet(dir)
    Similarity.ivfUnpersist(cent, asg)
    val probe = Similarity.semDedupOnIndex(emb, spark.read.parquet(dir), 0.3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(probe === gate)
  }

  test("corpus verdict is total and the lowest id of every cluster keeps") {
    val emb = Tables.embeddings(spark, sfDir)
    val v = Similarity.semDedup(emb, 0.3).cache()
    assert(v.count() === emb.count(), "one verdict per vector")
    assert(v.filter(!col("keep").isin(0, 1)).count() === 0)
    // the cluster minimum has no lower-id neighbour, so it can never drop
    val clusterMin = v.groupBy("cluster").agg(min("vec_id").as("vec_id"))
    assert(v.join(clusterMin, Seq("cluster", "vec_id"), "left_semi")
      .filter(col("keep") === 0).count() === 0)
    v.unpersist()
  }
}
