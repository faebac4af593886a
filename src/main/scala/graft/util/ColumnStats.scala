package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style per-column statistics in ONE value-grouped,
  * column-pruned pass — the building block of x85_column_stats
  * (`quality_checks.py:96-101` is the reference's distinct-count
  * check; this is its engine form).
  *
  * Why not `countDistinct` beside `min`/`max` in a single wide
  * aggregate: several distinct aggregates in one `agg` plan an Expand
  * that replicates the scan once per distinct branch (4 NDVs ⇒ a
  * 5-branch Expand, the a26/a15 lesson — and inside an EAGERLY
  * executed build the blow-up is invisible to plan audits, because
  * the registered query only shows the LocalTableScan of the final
  * few rows). Grouping by the value instead map-combines to the
  * per-value count table — shuffle size = NDV, not rows — and a 1-row
  * fold then reads every stat from it:
  *   ndv = rows of the table (null group excluded, matching
  *         countDistinct), min/max over distinct values ≡ over all
  *         values, n = Σ counts (null group included, matching
  *         count(*)).
  * At 100 TB this is one exchange of NDV rows per column; the wide
  * Expand form shuffles branches × rows. */
object ColumnStats {

  /** The per-value count table (`__v` double, `__w` long) — ONE
    * column-pruned scan; every stat (and, weighted through
    * [[GroupedQuantiles]], every exact quantile) derives from it. */
  def valueCounts(df: DataFrame, c: String): DataFrame =
    df.groupBy(col(c).cast("double").as("__v"))
      .agg(count(lit(1)).as("__w"))

  /** 1-row fold of a [[valueCounts]] table: `ndv`, `mn`, `mx`, `n`. */
  def fromValueCounts(vc: DataFrame): DataFrame =
    vc.agg(count(when(col("__v").isNotNull, 1)).as("ndv"),
      min("__v").as("mn"), max("__v").as("mx"),
      sum("__w").as("n"))

  /** 1-row frame: `ndv`, `mn`, `mx`, `n` for column `c` cast to double. */
  def onePass(df: DataFrame, c: String): DataFrame =
    fromValueCounts(valueCounts(df, c))
}
