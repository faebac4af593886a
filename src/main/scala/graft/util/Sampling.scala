package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/ordering for training-data assembly.
  *
  * `rand()`-based sampling is partition- and run-dependent — a retry
  * produces a different dataset, which poisons dedup bookkeeping and
  * makes experiments unrepeatable. Everything here derives from a
  * content hash of the row id: the same row lands on the same side of
  * every cut on every run of every cluster.
  */
object Sampling {

  /** Uniform bucket in [0, 256) from the id's md5 (first two hex digits)
    * — engine-reproducible (same formula runs in the DuckDB oracle). */
  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 2), 16, 10).cast("int")

  /** Keep ~`fraction` of rows, deterministically. */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(hashBucket(col(idCol)) < lit((fraction * 256).toInt))

  /** Per-stratum keep fractions (class rebalancing): strata not listed
    * keep everything. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       fractions: Map[String, Double]): DataFrame = {
    val cut = fractions.foldLeft(lit(256): Column) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit((f * 256).toInt)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < cut)
  }

  /** Deterministic global shuffle order for training: sort by the id's
    * md5 — decorrelates neighbours without any RNG state. */
  def shuffleKey(id: Column): Column = md5(id.cast("string"))
}
