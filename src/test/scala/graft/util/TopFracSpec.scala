package graft.util

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopFracSpec extends SparkSpecBase {

  import spark.implicits._

  // deterministic skewed corpus: group sizes 200/57/3, score collisions
  // guaranteed (small multiplier modulus), scores span many coarse buckets
  private lazy val data: DataFrame =
    ((0 until 200).map(i => ("big", i.toLong, (i * 9973L) % 997 * 1000)) ++
     (0 until 57).map(i => ("mid", 1000L + i, (i * 7919L) % 300 * 3000)) ++
     (0 until 3).map(i => ("tiny", 2000L + i, i * 100000L)))
      .toDF("g", "id", "score")

  /** The single-window reference semantics: rank per group by
    * (score desc, id asc), keep rank <= floor(n * keepPpm / 1e6). */
  private def globalRankKeep(df: DataFrame, keepPpm: Long): DataFrame = {
    val quotas = df.groupBy("g").agg(count(lit(1)).as("n"))
      .select(col("g"), expr(s"n * $keepPpm div 1000000").as("quota"))
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    df.withColumn("rn", row_number().over(w))
      .join(quotas, Seq("g"))
      .select(col("g"), col("id"), col("score"),
        (col("rn") <= col("quota")).cast("int").as("keep"))
  }

  private def assertSameKeeps(keepPpm: Long, coarseDiv: Long): Unit = {
    val fast = TopFrac.keepTopFrac(data, "g", "score", "id", keepPpm, coarseDiv)
    val ref = globalRankKeep(data, keepPpm)
    assert(fast.count() === data.count())
    assert(fast.except(ref).count() === 0)
    assert(ref.except(fast).count() === 0)
  }

  test("two-phase keep set equals the single-window global rank (30%)") {
    assertSameKeeps(300000L, 1000L)
  }

  test("equivalence holds across histogram resolutions, including the degenerate ones") {
    // coarseDiv=1: every score its own bucket (boundary = tie run only);
    // huge coarseDiv: one bucket per group (boundary = the whole group)
    for (div <- Seq(1L, 10L, 1000L, 100000000L); ppm <- Seq(100000L, 500000L, 900000L))
      assertSameKeeps(ppm, div)
  }

  test("keepPpm=1e6 keeps everything; tiny fractions keep exact floors") {
    val all = TopFrac.keepTopFrac(data, "g", "score", "id", 1000000L)
    assert(all.filter(col("keep") === 0).count() === 0)
    // 1% of 200/57/3 floors to 2/0/0 kept rows
    val one = TopFrac.keepTopFrac(data, "g", "score", "id", 10000L)
    val kept = one.filter(col("keep") === 1).groupBy("g").count()
      .as[(String, Long)].collect().toMap
    assert(kept.getOrElse("big", 0L) === 2L)
    assert(kept.getOrElse("mid", 0L) === 0L)
    assert(kept.getOrElse("tiny", 0L) === 0L)
  }

  test("equivalence on ScalaCheck-generated score distributions") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      g <- Gen.oneOf("p", "q", "r")
      s <- Gen.frequency(3 -> Gen.choose(0L, 200L), 1 -> Gen.choose(0L, 2000000L))
    } yield (g, s)
    val rows = (0 until 400).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(99L + i)).map { case (g, s) => (g, i.toLong, s) })
      .toDF("g", "id", "score")
    for (ppm <- Seq(250000L, 700000L); div <- Seq(100L, 5000L)) {
      val fast = TopFrac.keepTopFrac(rows, "g", "score", "id", ppm, div)
      val ref = globalRankKeep(rows, ppm)
      assert(fast.except(ref).count() === 0 && ref.except(fast).count() === 0,
        s"mismatch at ppm=$ppm div=$div")
    }
  }

  test("ties at the cut resolve by ascending id, exactly quota rows kept") {
    // every row in one group has the SAME score: the boundary rank is
    // pure id order and must keep exactly floor(n/2)
    val flat = (0 until 20).map(i => ("f", i.toLong, 7777L)).toDF("g", "id", "score")
    val cut = TopFrac.keepTopFrac(flat, "g", "score", "id", 500000L)
    val keptIds = cut.filter(col("keep") === 1).select("id").as[Long].collect().sorted
    assert(keptIds.toSeq === (0L until 10L))
  }
}
