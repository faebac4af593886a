package graft.plans

import graft.SparkSpecBase
import org.apache.spark.sql.types._

/** Whole-surface output-portability guard — the driver's comparator
  * contract, promoted from a code comment (a18_group_arrays,
  * queries/Relational.scala) to an enforced rule after round 9 shipped
  * three formally-red-but-substantively-correct rows:
  *
  *   - ARRAY/MAP/STRUCT output columns are not hashable/sortable by a
  *     pandas-based comparator (x101_postings died in sort_values on
  *     numpy arrays) → project collections to a joined string.
  *   - DECIMAL with precision > 18 round-trips through float64 on the
  *     DuckDB→pandas side, losing exact-int precision above 2^53
  *     (q_table_checksum's ~5e17 checksums, x128's Σc² pair counts) →
  *     terminal-cast to DOUBLE (the money convention), BIGINT, or a
  *     digit STRING.
  *
  * Every registered query's RESULT schema must be free of both. The
  * second test proves the guard itself bites on a deliberately-bad
  * fixture, so a silent weakening of the rule can't pass unnoticed. */
class SurfaceOutputPortabilitySpec extends SparkSpecBase {

  /** Columns a pandas/DuckDB comparator cannot hash exactly. */
  private def nonPortable(schema: StructType): Seq[String] =
    schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case _: ArrayType | _: MapType | _: StructType =>
          Some(s"${f.name}: ${f.dataType.simpleString}")
        case d: DecimalType if d.precision > 18 =>
          Some(s"${f.name}: ${f.dataType.simpleString}")
        case _ => None
      }
    }

  test("every surface query emits only comparator-portable column types") {
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .flatMap { case (n, fn) =>
        val bad =
          try nonPortable(fn(spark, sfDir).schema)
          catch {
            case e: Throwable => fail(s"$n failed to analyze: ${e.getMessage}")
          }
        if (bad.nonEmpty) Some(s"$n(${bad.mkString("; ")})") else None
      }
    spark.catalog.clearCache()
    assert(offenders.isEmpty,
      s"non-portable output columns on: ${offenders.mkString(", ")}")
  }

  test("the guard rejects a deliberately-bad fixture") {
    import org.apache.spark.sql.functions._
    val bad = spark.range(3).select(
      array(col("id")).as("arr"),
      col("id").cast("decimal(38,0)").as("wide"),
      map(col("id"), col("id")).as("m"),
      struct(col("id")).as("st"),
      col("id").cast("decimal(18,2)").as("money"), // allowed
      col("id").cast("string").as("s"))            // allowed
    val flagged = nonPortable(bad.schema).map(_.takeWhile(_ != ':'))
    assert(flagged == Seq("arr", "wide", "m", "st"))
  }
}
