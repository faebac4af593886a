package graft.sim

import graft.SparkSpecBase
import graft.Tables
import org.apache.spark.sql.functions._

/** Round-14 pins for [[Similarity.annTopKBounded]] — the hot-bucket
  * guard completing the ANN scale triad (x13's exact-clone collapse,
  * x35's adaptive geometry, x13b's hard per-bucket candidate bound).
  */
class AnnBoundedSpec extends SparkSpecBase {
  import spark.implicits._

  test("an unreachable cap is the identity: bounded ≡ annTopK bit-for-bit") {
    // doubles as a second lineage pin: bounded runs the UNCOLLAPSED
    // pipeline + cap, annTopK the clone-collapsed one — equality here
    // re-proves the collapse is output-neutral through a second path
    val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 150).cache()
    val bounded = Similarity.annTopKBounded(emb, 64, 5, Int.MaxValue)
      .select("qid", "vb", "cos", "rank").as[(Long, Long, Double, Int)].collect().toSet
    val plain = Similarity.annTopK(emb, 64, 5)
      .select("qid", "vb", "cos", "rank").as[(Long, Long, Double, Int)].collect().toSet
    assert(plain.nonEmpty)
    assert(bounded === plain)
  }

  test("a planted hot cluster is excluded by the cap, and re-admitted when the cap clears it") {
    val base = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 100)
      .select("vec_id", "embedding").cache()
    // 40 copies of vector 0 at derived ids: every bucket the family
    // occupies holds ≥ 41 members
    val hot = spark.range(1, 41).toDF("i")
      .crossJoin(base.filter(col("vec_id") === 0).select(col("embedding")))
      .select((col("i") + 1000).as("vec_id"), col("embedding"))
    val all = base.unionByName(hot).cache()

    val capped = Similarity.annTopKBounded(all, 64, 5, maxBucket = 32).cache()
    // the recall trade, visible: the family (vector 0 included) floods
    // its buckets past the cap and vanishes from both sides
    assert(capped.filter(col("qid") === 0 || col("vb") === 0 ||
      col("qid") > 1000 || col("vb") > 1000).count() === 0)
    assert(capped.count() > 0) // cold vectors still resolve

    // positive control: a cap that CLEARS the family re-admits it with
    // its clone mates ranked first (lowest ids, self-cos ties)
    val roomy = Similarity.annTopKBounded(all, 64, 5, maxBucket = 200)
    val v0 = roomy.filter(col("qid") === 0).orderBy("rank")
      .select("vb").as[Long].collect()
    assert(v0.take(5).toSeq === Seq(1001L, 1002L, 1003L, 1004L, 1005L))
  }
}
