package graft.util

import graft.SparkSpecBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins TopFrac.tiles: the histogram-refined n-tile label must equal
  * the single-sort definition (r−1)·nTiles div n under every bucket
  * geometry, including boundary buckets that straddle tiles. */
class TilesSpec extends SparkSpecBase {
  import spark.implicits._

  private def expected(df: org.apache.spark.sql.DataFrame, n: Int) = {
    val w = Window.orderBy(col("s").desc, col("id"))
    df.withColumn("rn", row_number().over(w))
      .crossJoin(df.agg(count(lit(1)).as("n")))
      .withColumn("exp", expr(s"(rn - 1) * $n div n").cast("int"))
      .select("id", "exp")
  }

  test("tiles equal the global-rank definition on ties and boundary buckets") {
    // scores collide within buckets (coarseDiv 10) and across ties
    val df = (1L to 97L).map(i => (i, (i * 7 % 40) * 3)).toDF("id", "s")
    val got = TopFrac.tiles(df, "s", "id", 10, coarseDiv = 10L)
      .select("id", "tile")
    val exp = expected(df, 10)
    assert(got.join(exp, Seq("id"))
      .filter(col("tile") =!= col("exp")).count() === 0)
  }

  test("tile labels are partition-invariant") {
    val df = (1L to 400L).map(i => (i, (i * 13 % 97) * 5)).toDF("id", "s")
    def labels(p: Int) = TopFrac.tiles(df.repartition(p), "s", "id", 10, 50L)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(labels(1) === labels(7))
  }

  test("groupTiles equals the per-group global-rank definition, dominant group included") {
    // group a: 90 rows (the "dominant source"), group b: 7, group c: 1
    val df = ((1L to 90L).map(i => ("a", i, (i * 11 % 23) * 4)) ++
      (1L to 7L).map(i => ("b", 100L + i, i * 10)) ++
      Seq(("c", 200L, 5L))).toDF("g", "id", "s")
    val got = TopFrac.groupTiles(df, "g", "s", "id", 10, coarseDiv = 8L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("tile")).toMap
    val w = Window.partitionBy("g").orderBy(col("s").desc, col("id"))
    val wn = Window.partitionBy("g")
    val exp = df.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("exp", expr("(rn - 1) * 10 div n").cast("int"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("exp")).toMap
    assert(got === exp)
    // the singleton group lands whole in tile 0
    assert(got(200L) === 0)
  }

  test("single bucket and single tile degenerate cases") {
    val df = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("id", "s")
    val one = TopFrac.tiles(df, "s", "id", 1, coarseDiv = 1000L)
    assert(one.select("tile").distinct().collect().map(_.getInt(0)).toSeq === Seq(0))
    // all-equal scores: tiles resolve purely by id tiebreak
    val got = TopFrac.tiles(df, "s", "id", 3, coarseDiv = 1000L)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2))
  }
}
