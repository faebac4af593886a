package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact top-fraction selection per group — "keep the best q% of each
  * language by quality" — WITHOUT a group-sized sort or rank window.
  *
  * The naive form (`row_number() OVER (PARTITION BY group ORDER BY score
  * DESC) <= quota`) sorts every group in one task; at 100 TB the
  * dominant language IS the corpus, so that window is a single-task
  * funnel (exactly the shape WindowScaleSafetySpec bans elsewhere).
  * This is the same problem domainQuota solves for CONSTANT quotas; here
  * the quota is proportional to group size, so the salted two-phase
  * re-rank doesn't apply (phase 2 would still be corpus-sized). Instead:
  * exact selection via histogram refinement —
  *
  *  1. coarse histogram: scores bucket by `score div coarseDiv` —
  *     a map-side-combined aggregate to ≤ (groups × buckets) rows,
  *     whatever the row count.
  *  2. cumulative counts DESC over that TINY table find, per group, the
  *     buckets kept whole (`cum ≤ quota`) and the single BOUNDARY bucket
  *     (`above < quota < cum`) with its residual take.
  *  3. the keep pass ranks rows within their (group, bucket) — window
  *     partitions are bucket-sized, never group-sized — and the rank is
  *     consulted only inside the one boundary bucket per group;
  *     everything else keeps/drops on its bucket decision alone.
  *
  * Selection semantics are defined entirely on the integer score with
  * ties broken by ascending id, so the kept set is unique and the DuckDB
  * oracle reproduces it bit-for-bit (spec: ≡ the single-window global
  * rank). At 100 TB the boundary window's partitions are 1/`buckets` of
  * each group — raise `coarseDiv` resolution (more buckets) to shrink
  * them further; the phase-1 table stays metadata-sized either way.
  */
object TopFrac {

  /** Adds an integer `keep` flag: 1 for the `keepPpm`-millionths of each
    * group with the highest (`scoreCol`, lowest `idCol`) — exact, not
    * approximate. `scoreCol` must be a non-negative integral column.
    *
    * The input plan is evaluated exactly twice (histogram pass + keep
    * pass) — everything else derives from the metadata-sized histogram:
    * group totals and quotas are window sums OVER the histogram, not a
    * third scan, and the boundary refinement is ONE bucket-partitioned
    * rank window on the keep pass (max partition = one coarse bucket),
    * not a boundary self-join. */
  def keepTopFrac(df: DataFrame, groupCol: String, scoreCol: String, idCol: String,
                  keepPpm: Long, coarseDiv: Long = 1000L): DataFrame = {
    val scored = df.select(col(groupCol), col(scoreCol), col(idCol))
      .withColumn("__cb", expr(s"$scoreCol div $coarseDiv"))
    val hist = scored.groupBy(groupCol, "__cb").agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(groupCol).orderBy(col("__cb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(groupCol)
    val decisions = hist
      .withColumn("__cum", sum("__c").over(wCum))
      .withColumn("__n", sum("__c").over(wTot))
      .withColumn("__quota", expr(s"__n * $keepPpm div 1000000"))
      .withColumn("__above", col("__cum") - col("__c"))
      .select(col(groupCol), col("__cb"),
        (col("__cum") <= col("__quota")).as("__full"),
        (col("__above") < col("__quota") && col("__cum") > col("__quota")).as("__bnd"),
        (col("__quota") - col("__above")).as("__take"))
    val wBucket = Window.partitionBy(groupCol, "__cb")
      .orderBy(col(scoreCol).desc, col(idCol))
    scored.join(broadcast(decisions), Seq(groupCol, "__cb"))
      .withColumn("__rn", row_number().over(wBucket))
      .select(col(groupCol), col(idCol), col(scoreCol),
        (col("__full") || (col("__bnd") && col("__rn") <= col("__take")))
          .cast("int").as("keep"))
  }
}
