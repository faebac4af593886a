package graft.sim

import graft.SparkSpecBase
import graft.Tables
import org.apache.spark.sql.functions._

/** x63 hard-negative mining + x64 prototype label-error screen. */
class ContrastiveSpec extends SparkSpecBase {
  import spark.implicits._

  // axis-aligned toy geometry: label 0 lives on +x, label 1 on +y.
  // vec 2 is labeled 0 but points at +y — the planted label error and
  // the planted hardest negative for any label-1 query.
  private def toy = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f, 0.0f), 0),
    (2L, Array(0.0f, 1.0f, 0.0f), 0), // mislabeled: sits in label-1 space
    (3L, Array(0.0f, 0.95f, 0.05f), 1),
    (4L, Array(0.05f, 0.9f, 0.0f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("hardNegatives never returns a same-label vector and ranks the planted near-miss first") {
    val res = Similarity.hardNegatives(toy, toy.filter(col("vec_id") === 3L), 2).cache()
    val lab = toy.select(col("vec_id").as("qid"), col("label").as("qlab"))
    assert(res.join(lab, Seq("qid")).filter(col("neg_label") === col("qlab")).count() === 0)
    // vec 2 (labeled 0, pointing at +y) is the hardest cross-label
    // negative for query 3 — closer than any true +x vector
    val top = res.filter(col("rank") === 1).select("vb").as[Long].collect()
    assert(top.toSeq === Seq(2L))
    res.unpersist()
  }

  test("hardNegatives returns k ranked rows per query on the real table") {
    val emb = Tables.embeddings(spark, sfDir)
    val res = Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 5), 3).cache()
    assert(res.groupBy("qid").count().filter(col("count") =!= 3).count() === 0)
    assert(res.filter(col("rank") < 1 || col("rank") > 3).count() === 0)
    res.unpersist()
  }

  test("labelErrorScreen flags the planted mislabel and only it; verdict is total") {
    val res = Similarity.labelErrorScreen(toy).cache()
    assert(res.count() === 5) // one verdict per vector
    val suspects = res.filter(col("suspect")).select("vec_id", "pred_label")
      .as[(Long, Int)].collect().toSeq
    assert(suspects === Seq((2L, 1)))
    // best_cos is the argmax over prototypes, so it bounds own_cos
    assert(res.filter(col("own_cos") > col("best_cos") + lit(1e-12)).count() === 0)
    res.unpersist()
  }

  test("labelErrorScreen is partition-invariant") {
    val emb = Tables.embeddings(spark, sfDir)
    val a = Similarity.labelErrorScreen(emb).orderBy("vec_id").collect().toSeq
    val b = Similarity.labelErrorScreen(emb.repartition(7)).orderBy("vec_id").collect().toSeq
    assert(a === b)
  }
}
