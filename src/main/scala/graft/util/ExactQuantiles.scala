package graft.util

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles (quantile_cont semantics) of a double
  * column WITHOUT a global sort and WITHOUT Spark's built-in
  * `percentile`, whose TypedImperativeAggregate collects the whole
  * column into one reducer's buffer — the single-task funnel that OOMs
  * at 100 TB (measured here: 4 columns × 3 cuts via built-in
  * `percentile` = 20.6 s at sf0.1; this path ≈ one aggregate + one
  * bounded window per column).
  *
  * Shape (the TopFrac/ScalableRank histogram discipline):
  *   1. one aggregate → (n, min, max): a 1-row metadata collect
  *      (the x43/x61 bounded-collect pattern);
  *   2. rows bucket by linear interpolation into B monotonic value
  *      ranges — a per-row projection, partition-independent;
  *   3. the B-row bucket-count table collects (metadata) and prefix
  *      sums resolve which bucket holds each target rank;
  *   4. ONLY the ≤ 2·|ps| needed buckets (≈ n/B rows each) pass
  *      through a bucket-partitioned row_number to surface the exact
  *      lo/hi rank values; the corpus never sorts.
  *   5. quantile_cont interpolation (⌈h⌉−h)·v_lo + (h−⌊h⌋)·v_hi in
  *      driver doubles — the same IEEE op sequence Spark's
  *      `percentile` and DuckDB's quantile_cont apply, so values are
  *      bit-identical to both (a17 pins Spark ≡ DuckDB; the spec pins
  *      this ≡ Spark).
  *
  * Sizing: B=256 puts ~n/256 rows per extracted bucket; at corpus
  * sizes where n/B outgrows a task, raise B (the histogram stays
  * metadata) or add one refinement level inside the target bucket —
  * same recursion TopFrac documents. Ties need no tie-break: the value
  * AT a rank is well-defined whatever order equal values take. */
object ExactQuantiles {

  /** quantile_cont(`c`, p) for each p — exact, engine-portable. */
  def values(df: DataFrame, c: String, ps: Seq[Double], nBuckets: Int = 256): Seq[Double] = {
    val vals = df.select(col(c).cast("double").as("__v")).filter(col("__v").isNotNull)
    val stat = vals.agg(count(lit(1)), min("__v"), max("__v")).head()
    val n = stat.getLong(0)
    require(n > 0, s"quantiles of empty column $c")
    val mn = stat.getDouble(1); val mx = stat.getDouble(2)
    if (mn == mx) return ps.map(_ => mn)

    val wd = mx - mn
    val bucketed = vals.withColumn("__b",
      least(floor((col("__v") - mn) / wd * nBuckets).cast("long"), lit(nBuckets - 1L)))
    val counts = bucketed.groupBy("__b").agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)

    // 1-based global ranks each cut needs (lo and hi row of the interpolation)
    val hs = ps.map(p => (n - 1).toDouble * p)
    val ranks = hs.flatMap(h => Seq(math.floor(h).toLong + 1, math.ceil(h).toLong + 1)).distinct
    // rank → (bucket, local rank) via prefix sums over the histogram
    var off = 0L
    val spans = counts.map { case (b, bn) => val s = (b, off + 1, off + bn); off += bn; s }
    val need = ranks.map { r =>
      val (b, lo, _) = spans.find { case (_, lo, hi) => r >= lo && r <= hi }.get
      r -> (b, r - lo + 1)
    }.toMap

    val buckets = need.values.map(_._1).toSet.toSeq
    val pairCond = need.values.toSet.map { bl: (Long, Long) =>
      col("__b") === bl._1 && col("__r") === bl._2
    }.reduce(_ || _)
    val w = Window.partitionBy("__b").orderBy("__v")
    val got = bucketed.filter(col("__b").isin(buckets: _*))
      .withColumn("__r", row_number().over(w).cast("long"))
      .filter(pairCond)
      .select("__b", "__r", "__v")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    hs.map { h =>
      val lowerIdx = math.floor(h); val higherIdx = math.ceil(h)
      val lo = got(need(lowerIdx.toLong + 1))
      if (higherIdx == lowerIdx) lo
      else {
        val hi = got(need(higherIdx.toLong + 1))
        // Spark Percentile.getPercentile's exact weighted op order
        // (≡ quantile_cont): NOT lo + frac·(hi−lo), which differs by
        // 1 ulp on some inputs (spec pins the distinction)
        (higherIdx - h) * lo + (h - lowerIdx) * hi
      }
    }
  }
}
