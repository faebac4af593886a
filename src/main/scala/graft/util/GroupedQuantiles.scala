package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group quantile_cont at ARBITRARY cuts without a
  * group-sized buffer — [[GroupedMedian]] generalized (VERDICT r9 #4):
  * the built-in `percentile(v, p)` plans
  * `ObjectHashAggregate(partial_percentile)`, whose final merge holds a
  * GROUP'S ENTIRE value set in one task's buffer (the single-task
  * funnel measured at 20.6 s for x85's column profile and an OOM at
  * 100 TB). Histogram refinement instead:
  *
  *  1. rows bucket by `floor(v / coarseDiv)`; the (group, bucket)
  *     WEIGHT table is one map-side-combined aggregate — metadata-sized
  *     whatever the row count;
  *  2. per-group cumulative weights over that table locate, for every
  *     cut p, the bucket(s) holding the interpolation ranks
  *     k_lo = ⌊h⌋+1 and k_hi = ⌈h⌉+1 where h = (n−1)·p;
  *  3. ONLY those buckets' rows take a (group, bucket)-partitioned
  *     cumulative-weight window — partitions are bucket-sized, never
  *     group-sized — and each row covers the rank span
  *     (cum − w, cum], so the two rank values surface exactly;
  *  4. interpolation (⌈h⌉−h)·v_lo + (h−⌊h⌋)·v_hi — the same IEEE op
  *     sequence Spark's `percentile` and DuckDB's `quantile_cont`
  *     apply (the [[ExactQuantiles]] precedent, hash-proven against
  *     both engines), done as plan expressions so nothing collects.
  *
  * The optional weight column makes the same machinery run over a
  * pre-aggregated (value → count) table — quantiles of a billion rows
  * from an NDV-sized frame (x85's stats pass reuses its value-count
  * table this way). Ties need no tie-break: the value AT a rank is
  * well-defined whatever order equal values take. At corpus sizes
  * where one bucket outgrows a task, shrink `coarseDiv` — the
  * histogram stays metadata. */
object GroupedQuantiles {

  /** One row per group: (`grp`, <name> per cut, `n`). `cuts` maps
    * output column name → p. `weight`: optional long column of row
    * multiplicities (None = every row counts once). */
  def cuts(df: DataFrame, grp: String, v: String, cuts: Seq[(String, Double)],
           coarseDiv: Double = 1000.0, weight: Option[String] = None): DataFrame = {
    require(cuts.nonEmpty, "at least one cut")
    val w = weight.map(col).getOrElse(lit(1L)).cast("long")
    val b = df.select(col(grp), col(v).cast("double").as("__v"), w.as("__w"))
      .filter(col("__v").isNotNull)
      .withColumn("__cb", floor(col("__v") / coarseDiv).cast("long"))
    val hist = b.groupBy(grp, "__cb").agg(sum("__w").as("__c"))
    val wCum = Window.partitionBy(grp).orderBy("__cb")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(grp)
    val n = sum("__c").over(wTot)
    def h(i: Int): Column = (col("__n") - 1).cast("double") * lit(cuts(i)._2)
    val dec0 = hist
      .withColumn("__cum", sum("__c").over(wCum))
      .withColumn("__n", n)
      .withColumn("__start", col("__cum") - col("__c") + 1)
    val dec = cuts.indices.foldLeft(dec0) { (d, i) =>
      d.withColumn(s"__h_$i", h(i))
        .withColumn(s"__klo_$i", floor(col(s"__h_$i")).cast("long") + 1)
        .withColumn(s"__khi_$i", ceil(col(s"__h_$i")).cast("long") + 1)
    }
    def holds(k: Column): Column = col("__start") <= k && k <= col("__cum")
    val needed = cuts.indices
      .map(i => holds(col(s"__klo_$i")) || holds(col(s"__khi_$i")))
      .reduce(_ || _)
    val need = dec.filter(needed).select(
      col(grp) +: col("__cb") +: col("__start") +: col("__n") +:
        cuts.indices.flatMap(i =>
          Seq(col(s"__h_$i"), col(s"__klo_$i"), col(s"__khi_$i"))): _*)
    // within-bucket cumulative weight; a row's GLOBAL rank span is
    // (__cumv - __w, __cumv]
    val wB = Window.partitionBy(grp, "__cb").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = b.join(broadcast(need), Seq(grp, "__cb"))
      .withColumn("__cumv", sum("__w").over(wB) + col("__start") - 1)
    def at(k: Column): Column =
      when(col("__cumv") >= k && col("__cumv") - col("__w") < k, col("__v"))
    val aggs = cuts.indices.flatMap { i =>
      Seq(max(at(col(s"__klo_$i"))).as(s"__vlo_$i"),
        max(at(col(s"__khi_$i"))).as(s"__vhi_$i"),
        first(s"__h_$i").as(s"__fh_$i"))
    } :+ first("__n").as("__fn")
    val got = ranked.groupBy(grp).agg(aggs.head, aggs.tail: _*)
    val outs = cuts.zipWithIndex.map { case ((name, _), i) =>
      val fh = col(s"__fh_$i")
      when(fh === floor(fh), col(s"__vlo_$i"))
        .otherwise((ceil(fh) - fh) * col(s"__vlo_$i") +
          (fh - floor(fh)) * col(s"__vhi_$i")).as(name)
    }
    got.select(col(grp) +: outs :+ col("__fn").as("n"): _*)
  }
}
