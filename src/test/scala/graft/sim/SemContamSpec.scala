package graft.sim

import graft.SparkSpecBase
import graft.Tables
import graft.queries.TrainingData
import org.apache.spark.sql.functions._

/** Pins x74 semantic-decontamination semantics: a total per-train-vector
  * verdict, flag ⟺ a within-cluster benchmark neighbour at cosine ≥ τ,
  * and the cluster-blocked screen is a strict SUBSET of the brute-force
  * contamination set (blocking can miss cross-cluster neighbours, never
  * invent one). */
class SemContamSpec extends SparkSpecBase {
  import spark.implicits._

  test("pairCosines matches hand-computed cosines on an id-pair set") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.6f, 0.8f))).toDF("vec_id", "embedding")
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("ta", "tb")
    val got = Similarity.pairCosines(pairs, emb, "ta", "tb")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(math.abs(got((1L, 2L)) - 0.0) < 1e-9)
    assert(math.abs(got((1L, 3L)) - 0.6) < 1e-9)
    assert(math.abs(got((2L, 3L)) - 0.8) < 1e-9)
  }

  test("verdict is total over train vectors and flag agrees with the stats") {
    val v = TrainingData.queries("x74_semantic_decontam")(spark, sfDir).cache()
    val nTrain = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 20 =!= 0).count()
    assert(v.count() === nTrain, "one verdict per train vector")
    assert(v.filter(col("vec_id") % 20 === 0).count() === 0,
      "benchmark vectors never appear")
    assert(v.filter((col("n_bench_near") > 0) =!=
      (col("is_contaminated") === 1)).count() === 0)
    val tau = TrainingData.SemContamThreshold
    assert(v.filter(col("is_contaminated") === 1 && col("max_cand_cos") < tau)
      .count() === 0, "a flagged vector's best candidate clears the cut")
    assert(v.filter(col("is_contaminated") === 0 && col("max_cand_cos") >= tau)
      .count() === 0, "an unflagged vector has no candidate at the cut")
    v.unpersist()
  }

  test("probe over a parquet-persisted assignment table equals the gate form") {
    val emb = Tables.embeddings(spark, sfDir)
    val isBench = col("vec_id") % 20 === 0
    val tau = TrainingData.SemContamThreshold
    val gate = Similarity.semanticContam(emb, isBench, tau)
      .collect().map(_.mkString("|")).toSet
    val (cent, asg) = Similarity.ivfIndex(emb)
    val dir = java.nio.file.Files.createTempDirectory("semcontam-idx").toString
    asg.write.mode("overwrite").parquet(dir)
    Similarity.ivfUnpersist(cent, asg)
    val probe = Similarity.semanticContamOnIndex(emb, spark.read.parquet(dir), isBench, tau)
      .collect().map(_.mkString("|")).toSet
    assert(probe === gate)
  }

  test("cluster-blocked flags are a subset of brute-force contamination") {
    val emb = Tables.embeddings(spark, sfDir)
    val flagged = TrainingData.queries("x74_semantic_decontam")(spark, sfDir)
      .filter(col("is_contaminated") === 1).select("vec_id")
    // brute force: every train×bench pair, no blocking
    val cand = emb.filter(col("vec_id") % 20 =!= 0).select(col("vec_id").as("tid"))
      .crossJoin(emb.filter(col("vec_id") % 20 === 0).select(col("vec_id").as("bid")))
    val exact = Similarity.pairCosines(cand, emb, "tid", "bid")
      .filter(col("cos") >= TrainingData.SemContamThreshold)
      .select(col("tid").as("vec_id")).distinct()
    assert(flagged.join(exact, Seq("vec_id"), "left_anti").count() === 0,
      "blocking never flags a pair brute force would not")
  }
}
