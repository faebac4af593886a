package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) locality keys — multi-dimensional data LAYOUT.
  *
  * A parquet/iceberg table sorted by one column prunes row groups on
  * that column only; sorting by the bit-interleave of two bucketed
  * dimensions keeps rows close in BOTH, so min/max row-group stats
  * prune two-dimensional predicates (`len BETWEEN … AND source = …`)
  * at once. At 100 TB the write path is
  * `repartitionByRange($"zkey") .sortWithinPartitions($"zkey")` — a
  * range shuffle on the key, then per-file locality; the key itself is
  * pure per-row integer arithmetic (codegen'd, engine-reproducible).
  */
object ZOrder {

  /** Bits per dimension; the interleaved key spans 2·Bits bits. */
  val Bits = 8

  /** Interleave two `Bits`-bit bucket columns into one Morton key: bit
    * i of `a` lands at position 2i+1, bit i of `b` at 2i. Shift/mask
    * integer ops only — bit-identical in any engine. */
  def zkey2(a: Column, b: Column): Column =
    (0 until Bits).map { i =>
      shiftright(a.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)) +
        shiftright(b.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
    }.reduce(_ + _)

  /** The same interleave as SQL text (for generated oracle queries):
    * `a`/`b` are integer-typed SQL expressions. */
  def zkey2Sql(a: String, b: String): String =
    (0 until Bits).map { i =>
      s"((($a >> $i) & 1) * ${1L << (2 * i + 1)} + (($b >> $i) & 1) * ${1L << (2 * i)})"
    }.mkString("(", " + ", ")")
}
