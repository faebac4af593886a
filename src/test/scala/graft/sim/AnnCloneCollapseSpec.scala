package graft.sim

import graft.SparkSpecBase
import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-14 pin for the clone-collapsed [[Similarity.annTopK]] (the r13
  * sf1 replica measured the uncollapsed band self-join at 209× per 10×
  * of data — identical vectors share every band, so a clone group of
  * size g contributed g² candidate pairs). The rewrite collapses
  * exact-duplicate quantized arrays to one representative before the
  * band join and reconstructs clone-group neighbors arithmetically; its
  * CONTRACT is bit-identical output to the uncollapsed plan on every
  * input. These tests plant real clone groups and compare against the
  * uncollapsed plan re-implemented verbatim below — a behavioral
  * reference the production code no longer contains.
  */
class AnnCloneCollapseSpec extends SparkSpecBase {
  import spark.implicits._

  /** The pre-r14 uncollapsed annTopK, verbatim — the semantic oracle.
    * Geometry is the fixed 32-plane default of that era; the production
    * annTopK's r15 adaptive default resolves the SAME width on every
    * corpus below 4097 rows (the 8-bit floor), which covers all the
    * planted corpora here — the above-floor regime is pinned separately
    * by AnnAdaptiveDefaultSpec. */
  private def uncollapsedAnnTopK(emb: DataFrame, dim: Int, k: Int): DataFrame = {
    val banded = Similarity.sigBands(Similarity.signatures(emb, dim))
    val a = banded.select(col("vec_id").as("qid"), col("band_idx"), col("band"))
    val b = banded.select(col("vec_id").as("vb"), col("band_idx"), col("band"))
    val cand = a.join(b, Seq("band_idx", "band")).filter(col("qid") =!= col("vb"))
      .select("qid", "vb").distinct()
    val n = Similarity.norms(emb)
    Similarity.pairDots(cand, emb, emb, "qid", "vb")
      .join(n.select(col("vec_id").as("qid"), col("nsq").as("na")), Seq("qid"))
      .join(n.select(col("vec_id").as("vb"), col("nsq").as("nb")), Seq("vb"))
      .select(col("qid"), col("vb"),
        (col("dot").cast("double") / sqrt(col("na") * col("nb"))).as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(desc("cos"), col("vb"))))
      .filter(col("rank") <= k)
  }

  /** 120 real vectors + clone groups of size 2 (ids +10000 for id<40)
    * and size 3 (ids +20000 for id<15) — groups of size 1, 2 and 3
    * coexist, clone ids interleave above and below group minima. */
  private def clonePlanted(): DataFrame = {
    val base = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 120)
      .select("vec_id", "embedding")
    base
      .unionByName(base.filter(col("vec_id") < 40)
        .select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
      .unionByName(base.filter(col("vec_id") < 15)
        .select((col("vec_id") + 20000).as("vec_id"), col("embedding")))
  }

  test("clone-collapsed annTopK is bit-identical to the uncollapsed plan on planted clones") {
    val emb = clonePlanted().cache()
    val got = Similarity.annTopK(emb, 64, 5)
      .select("qid", "vb", "cos", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val want = uncollapsedAnnTopK(emb, 64, 5)
      .select("qid", "vb", "cos", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(want.nonEmpty)
    // planted positive: clone mates actually surface (cos is exactly the
    // reconstructed self-cos for ≥ one pair per clone group)
    assert(want.exists { case (q, v, _, _) => q < 40 && v == q + 10000 })
    assert(got === want)
  }

  test("clone-collapsed annTopK is bit-identical to the uncollapsed plan on clone-free data") {
    val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 150).cache()
    val got = Similarity.annTopK(emb, 64, 5)
      .select("qid", "vb", "cos", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val want = uncollapsedAnnTopK(emb, 64, 5)
      .select("qid", "vb", "cos", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("a large clone group resolves arithmetically: lowest-id mates, ranks 1..k") {
    // one vector replicated 60× plus two distinct vectors — the
    // uncollapsed plan would generate 60² candidate pairs for the group;
    // the collapsed plan derives the same answer from k+1 low ids
    val base = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 3)
      .select("vec_id", "embedding").cache()
    val one = base.filter(col("vec_id") === 0)
    val clones = spark.range(1, 60).toDF("i")
      .crossJoin(one.select(col("embedding")))
      .select((col("i") * 100 + 1000).as("vec_id"), col("embedding"))
    val emb = base.unionByName(clones)
    val res = Similarity.annTopK(emb, 64, 5)
      .filter(col("qid") === 6900) // the HIGHEST clone id (59*100+1000) —
      // the member farthest beyond the rn<=k+1 lowIds prefix
      .orderBy("rank")
      .select("vb", "cos", "rank").as[(Long, Double, Int)].collect()
    // its top-5 are the five lowest ids of the clone group: 0, then
    // 1100, 1200, 1300, 1400 — all at the exact reconstructed self-cos
    assert(res.map(_._1).toSeq === Seq(0L, 1100L, 1200L, 1300L, 1400L))
    assert(res.map(_._3).toSeq === Seq(1, 2, 3, 4, 5))
    val nsq = base.filter(col("vec_id") === 0)
      .select(Similarity.dotFixed(col("embedding"), col("embedding")).cast("double"))
      .as[Double].head()
    val selfCos = nsq / math.sqrt(nsq * nsq)
    assert(res.map(_._2).forall(_ == selfCos))
  }

  test("empty and null embeddings never surface (uncollapsed plans had no signature rows for them)") {
    val base = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 50)
      .select("vec_id", "embedding")
    val degenerate = Seq(
      (90001L, Array.empty[Float]),
      (90002L, Array.empty[Float])).toDF("vec_id", "embedding")
      .unionByName(Seq(90003L).toDF("vec_id")
        .select(col("vec_id"), lit(null).cast("array<float>").as("embedding")))
    val res = Similarity.annTopK(base.unionByName(degenerate), 64, 5).cache()
    assert(res.filter(col("qid") >= 90000L || col("vb") >= 90000L).count() === 0)
    assert(res.count() > 0)
  }
}
