package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group median of a non-negative integral column WITHOUT a
  * group-sized sort or rank window — the grouped companion to
  * [[ExactQuantiles]] (which is global and collects to the driver) and
  * [[TopFrac]] (which selects, rather than measures, by rank).
  *
  * The naive form — `percentile(v, 0.5) OVER/GROUP BY` — is a
  * TypedImperativeAggregate that collects every group's values into one
  * reducer buffer; a `row_number` window per group funnels the dominant
  * group through one task. Both die at 100 TB. Histogram refinement
  * instead:
  *
  *  1. values bucket by `v div coarseDiv`; the (group, bucket) count
  *     table is a map-side-combined aggregate, metadata-sized whatever
  *     the row count;
  *  2. per-group cumulative counts over that table (group-partitioned
  *     window over ≤ buckets rows) locate the bucket(s) holding the two
  *     middle ranks k1 = (n+1) div 2 and k2 = (n+2) div 2;
  *  3. ONLY those buckets' rows rank under a (group, bucket)-partitioned
  *     window — partitions are bucket-sized, never group-sized — and the
  *     two middle values surface.
  *
  * Semantics are quantile_cont(0.5): for even n the two middle values
  * average. To stay integral (and engine-portable — no half-cent
  * doubles mid-plan), the result is returned DOUBLED: `med2` = v(k1) +
  * v(k2) (odd n: 2·v(k)). Ties need no tie-break — the value AT a rank
  * is well-defined whatever order equal values take. At corpus sizes
  * where a single bucket outgrows a task, raise the resolution (smaller
  * `coarseDiv` ⇒ more, smaller buckets); the histogram stays metadata.
  */
object GroupedMedian {

  /** Per-group 2×median of integral column `v` (≥ 0): one row per group,
    * columns (`grp`, `med2`). */
  def med2(df: DataFrame, grp: String, v: String, coarseDiv: Long = 1000L): DataFrame = {
    val b = df.select(col(grp), col(v)).withColumn("__cb", expr(s"$v div $coarseDiv"))
    val hist = b.groupBy(grp, "__cb").agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(grp).orderBy("__cb")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(grp)
    val dec = hist
      .withColumn("__cum", sum("__c").over(wCum))
      .withColumn("__n", sum("__c").over(wTot))
      .withColumn("__k1", expr("(__n + 1) div 2"))
      .withColumn("__k2", expr("(__n + 2) div 2"))
      .withColumn("__start", col("__cum") - col("__c") + 1)
      .filter((col("__start") <= col("__k1") && col("__k1") <= col("__cum"))
        || (col("__start") <= col("__k2") && col("__k2") <= col("__cum")))
      .select(col(grp), col("__cb"), col("__start"), col("__k1"), col("__k2"))
    val wB = Window.partitionBy(grp, "__cb").orderBy(v)
    b.join(broadcast(dec), Seq(grp, "__cb"))
      .withColumn("__r", row_number().over(wB).cast("long") + col("__start") - 1)
      .filter(col("__r") === col("__k1") || col("__r") === col("__k2"))
      .groupBy(grp)
      // odd n: k1 = k2 → ONE surviving row carries the median twice
      .agg(when(count(lit(1)) === 1, sum(col(v)) * 2)
        .otherwise(sum(col(v))).as("med2"))
  }
}
