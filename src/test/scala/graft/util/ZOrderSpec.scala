package graft.util

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpecBase {
  import spark.implicits._

  test("zkey2 matches hand-computed Morton codes") {
    val rows = Seq((10L, 5L), (255L, 255L), (255L, 0L), (0L, 255L), (0L, 0L))
      .toDF("a", "b")
      .withColumn("z", ZOrder.zkey2(col("a"), col("b")))
      .select("z").as[Long].collect().toSeq
    // a-bit i → position 2i+1, b-bit i → position 2i:
    // (10,5)=(1010,0101) → 8+128 + 1+16 = 153
    assert(rows === Seq(153L, 65535L, 43690L, 21845L, 0L))
  }

  test("the SQL form generates the identical key") {
    val df = Seq((10L, 5L), (201L, 77L), (3L, 250L)).toDF("a", "b")
    val viaCol = df.withColumn("z", ZOrder.zkey2(col("a"), col("b")))
    val viaSql = df.withColumn("z", expr(ZOrder.zkey2Sql("a", "b")))
    assert(viaCol.select("z").as[Long].collect().toSeq ===
      viaSql.select("z").as[Long].collect().toSeq)
  }

  test("zkey order tightens per-row-group min/max ranges on both dims") {
    // the pruning-relevant metric: cut the layout into fixed-size
    // "row groups" and sum each group's (max−min) spread over BOTH
    // dimensions — that spread IS the min/max stats width a reader
    // prunes against. Z-order groups are square tiles (spread 3+3);
    // lexicographic groups are full rows (spread 0+15).
    val grid = (for { a <- 0L until 16L; b <- 0L until 16L } yield (a, b))
    def groupSpread(sorted: Seq[(Long, Long)], groupSize: Int): Long =
      sorted.grouped(groupSize).map { g =>
        val (as, bs) = (g.map(_._1), g.map(_._2))
        (as.max - as.min) + (bs.max - bs.min)
      }.sum
    val byZ = grid.sortBy { case (a, b) =>
      (0 until ZOrder.Bits).map(i =>
        (((a >> i) & 1L) << (2 * i + 1)) + (((b >> i) & 1L) << (2 * i))).sum
    }
    val byA = grid.sortBy(identity) // lexicographic (a, then b)
    assert(groupSpread(byZ, 16) < groupSpread(byA, 16))
  }
}
