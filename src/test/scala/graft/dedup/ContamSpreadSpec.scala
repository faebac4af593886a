package graft.dedup

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins x96's min-distance propagation on a planted chain — the real
  * corpus yields only hop-0 seeds (a near-dup of a contaminated doc
  * shares its 5-grams and seeds directly), so the relaxation rounds
  * are exercised here: seeds {1}, path 1—2—3—4 must produce hops
  * 0,1,2,NULL, and a planted diamond must take the SHORTER route. */
class ContamSpreadSpec extends SparkSpecBase {
  import spark.implicits._

  private def spread(seeds: Seq[Long], edges: Seq[(Long, Long)],
                     nodes: Seq[Long]): Map[Long, Option[Int]] = {
    val und = edges.toDF("doc_a", "doc_b")
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(edges.toDF("doc_a", "doc_b")
        .select(col("doc_b").as("src"), col("doc_a").as("dst")))
    var dist = nodes.toDF("doc_id")
      .join(seeds.toDF("doc_id").withColumn("d0", lit(0)), Seq("doc_id"), "left")
      .select(col("doc_id"), col("d0").as("dist"))
    for (_ <- 1 to 2) {
      val relaxed = und
        .join(dist.filter(col("dist").isNotNull), col("src") === col("doc_id"))
        .groupBy(col("dst")).agg(min(col("dist") + 1).as("nd"))
      dist = dist.join(relaxed, col("doc_id") === col("dst"), "left")
        .select(col("doc_id"), least(col("dist"), col("nd")).as("dist"))
    }
    dist.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
  }

  test("chain 1-2-3-4 from seed 1 yields hops 0,1,2,unreached") {
    val got = spread(Seq(1L), Seq(1L -> 2L, 2L -> 3L, 3L -> 4L), Seq(1L, 2L, 3L, 4L, 9L))
    assert(got === Map(1L -> Some(0), 2L -> Some(1), 3L -> Some(2),
      4L -> None, 9L -> None), s"$got")
  }

  test("diamond takes the shorter route; a second seed shortens its side") {
    // 1-2-4 and 1-3-4: node 4 is 2 hops; seeding 3 too makes it 1 hop
    val e = Seq(1L -> 2L, 2L -> 4L, 1L -> 3L, 3L -> 4L)
    assert(spread(Seq(1L), e, Seq(1L, 2L, 3L, 4L))(4L) === Some(2))
    assert(spread(Seq(1L, 3L), e, Seq(1L, 2L, 3L, 4L))(4L) === Some(1))
  }

  test("the surface query's verdicts are internally consistent") {
    val out = graft.queries.TrainingData.queries("x96_contam_spread")(spark, sfDir)
      .collect()
    out.foreach { r =>
      val suspect = r.getAs[Int]("is_suspect")
      assert((suspect == 1) === !r.isNullAt(r.fieldIndex("hop_dist")))
      if (suspect == 1) assert(r.getAs[Int]("hop_dist") <= 2)
    }
  }
}
