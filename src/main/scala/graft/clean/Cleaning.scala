package graft.clean

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cleaning transforms — the intended semantics of the reference's batch
  * ETL cleaning chain (`/root/reference/spark_etl.py:22-88`), re-expressed
  * as codegen-friendly Column expressions (no UDFs, SURVEY §2.2-2.3).
  *
  * Each function is a pure `DataFrame => DataFrame` / `Column => Column`
  * so Catalyst folds the whole chain into one projection (single
  * WholeStageCodegen span, no intermediate materialization).
  */
object Cleaning {

  /** F2 (`spark_etl.py:29-36`): string/double → double, NULL/NaN → 0.
    * `try_cast`, not `cast`: under ANSI mode (Spark 4 default) a plain
    * cast *throws* on malformed strings; the reference's pre-ANSI
    * semantics (malformed → NULL → fill) are what the pipeline needs.
    * `nanvl` first so NaN behaves like NULL, then coalesce-fill. */
  def numericFill(c: Column, fill: Double = 0.0): Column =
    coalesce(nanvl(c.try_cast("double"), lit(null)), lit(fill))

  /** F3 (`spark_etl.py:47-54`): negative amounts → positive. */
  def toPositive(c: Column): Column = abs(c)

  /** F1 (`spark_etl.py:43`): string → date. */
  def toDateCol(c: Column): Column = c.cast("date")

  /** F4 (`spark_etl.py:72`): leading integer of "36 months"-style field.
    * regexp_extract instead of the reference's 2-char substring so
    * ">99 months" parses too (SURVEY §7 risk 3). */
  def leadingInt(c: Column): Column =
    nullif(regexp_extract(c, "^\\s*(\\d+)", 1), lit("")).cast("int")

  /** F5 (`spark_etl.py:59`): sentinel string → NULL on given columns. */
  def sentinelToNull(df: DataFrame, sentinel: String, cols: Seq[String]): DataFrame =
    df.withColumns(cols.map(n =>
      n -> when(col(n) === lit(sentinel), lit(null)).otherwise(col(n))).toMap)

  /** F6 (`spark_etl.py:78`): NULL → default on one column. */
  def fillDefault(df: DataFrame, colName: String, default: String): DataFrame =
    df.na.fill(Map(colName -> default))

  /** F14 (`mongo_postgres_cdc.py:140-142,159-161`): empty/blank string → NULL. */
  def blankToNull(c: Column): Column =
    when(length(trim(c)) === 0, lit(null)).otherwise(c)

  /** P6 (`spark_etl.py:22-27`): CASE WHEN bucketing (emp-length analog).
    * Buckets a numeric measure into named bands. */
  def bucket(c: Column, bounds: Seq[(Double, String)], elseLabel: String): Column =
    bounds.foldRight(lit(elseLabel): Column) { case ((ub, label), acc) =>
      when(c < lit(ub), lit(label)).otherwise(acc)
    }

  /** P3 (`spark_etl.py:85-88`): drop rows with NULL key. */
  def dropNullKey(df: DataFrame, key: String): DataFrame =
    df.filter(col(key).isNotNull)

  /** D1 (`spark_etl.py:62`): full-row dedup. */
  def dedupFull(df: DataFrame): DataFrame = df.dropDuplicates()
}
