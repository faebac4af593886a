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

  /** Exact population n-tiles by (`scoreCol` desc, `idCol` asc) —
    * "which decile is this row in" — without a corpus-sized sort: the
    * [[keepTopFrac]] histogram refinement, ungrouped. The tile of the
    * row at global rank r (1-based) is (r−1)·nTiles div n (0 = best).
    * A bucket whose whole rank span lands in one tile labels every row
    * at once; only the ≤ nTiles−1 boundary buckets consult the
    * bucket-partitioned rank. The single unpartitioned window runs
    * over the METADATA-sized histogram, never the corpus. Appends an
    * integer `tile` column; `scoreCol` must be non-negative integral. */
  def tiles(df: DataFrame, scoreCol: String, idCol: String,
            nTiles: Int, coarseDiv: Long = 1000L): DataFrame =
    groupTiles(df.withColumn("__g", lit(1)), "__g", scoreCol, idCol,
      nTiles, coarseDiv).drop("__g")

  /** Per-GROUP exact n-tiles by (`scoreCol` desc, `idCol` asc) — the
    * grouped [[tiles]]: the tile of the row at within-group rank r is
    * (r−1)·nTiles div n_g (0 = best). Same refinement discipline: the
    * per-group cumulative windows run over the metadata-sized
    * (group × bucket) histogram — never over a group's rows, which for
    * the dominant group IS the corpus at 100 TB — and row-bearing rank
    * windows partition by (group, bucket), so the largest window
    * partition is one coarse bucket of one group. Appends an integer
    * `tile`; `scoreCol` must be non-negative integral. */
  def groupTiles(df: DataFrame, grpCol: String, scoreCol: String, idCol: String,
                 nTiles: Int, coarseDiv: Long = 1000L): DataFrame = {
    val scored = df.withColumn("__cb", expr(s"$scoreCol div $coarseDiv"))
    val hist = scored.groupBy(grpCol, "__cb").agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(grpCol).orderBy(col("__cb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(grpCol)
    val decisions = hist
      .withColumn("__cum", sum("__c").over(wCum))
      .withColumn("__n", sum("__c").over(wTot))
      .withColumn("__start", col("__cum") - col("__c") + 1)
      .withColumn("__ts", expr(s"(__start - 1) * $nTiles div __n"))
      .withColumn("__te", expr(s"(__cum - 1) * $nTiles div __n"))
      .select(col(grpCol), col("__cb"), col("__start"), col("__ts"),
        col("__te"), col("__n"))
    val wBucket = Window.partitionBy(grpCol, "__cb")
      .orderBy(col(scoreCol).desc, col(idCol))
    scored.join(broadcast(decisions), Seq(grpCol, "__cb"))
      .withColumn("__rn", row_number().over(wBucket))
      .withColumn("tile",
        when(col("__ts") === col("__te"), col("__ts"))
          .otherwise(expr(s"(__start + __rn - 2) * $nTiles div __n"))
          .cast("int"))
      .drop("__cb", "__start", "__ts", "__te", "__n", "__rn")
  }
}
