package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sorted-shard layout audit (X242): assign every row to
  * a fixed-count shard by EXACT global rank of a sort key, then report
  * the per-shard zone map (row count, key min/max) plus the boundary
  * quality — the plan a warehouse writer uses to produce a
  * measure-sorted, zone-map-prunable layout (x122/x127 read such
  * layouts; this is the write-side decision table).
  *
  * Why not `repartitionByRange`: its RangePartitioner SAMPLES the
  * boundaries, so two runs of the same job can produce different
  * shard contents — unacceptable for a layout that downstream
  * zone-map pruning and incremental rewrites key off. Exact global
  * rank via [[ScalableRank.globalRowNumber]] (two-phase bucket
  * prefix-sum — one narrow shuffle, no AllTuples window) keeps the
  * assignment bit-deterministic on any engine and any partitioning,
  * at the cost the sampler never pays honestly: ties are broken by
  * the caller's unique composite key, not sampler luck.
  *
  * `clean_cut` marks a shard whose min STRICTLY exceeds the previous
  * shard's max on the user-visible key (zone maps prune exactly);
  * a 0 means the boundary splits a run of equal keys (pruning still
  * correct, one shard of overlap). The audit window rides the
  * shards-sized (~32-row) aggregate — metadata, never data.
  */
object SortedLayout {

  /** `keyCol` — the user-visible sort measure (zone-map column);
    * `uniqueCol` — unique tiebreak; both must be non-negative integers
    * small enough that key·tieSpan + tie fits a long (the caller picks
    * `tieSpan` > max(uniqueCol)). */
  def sortedShardAudit(df: DataFrame, keyCol: String, uniqueCol: String,
                       tieSpan: Long, nShards: Int = 32): DataFrame = {
    val combined = df
      .withColumn("__k", col(keyCol).cast("long"))
      .withColumn("__sort",
        col("__k") * tieSpan + col(uniqueCol).cast("long"))
    val ranked = ScalableRank.globalRowNumber(combined, "__sort", "__rank")
    val n = ranked.agg(count(lit(1)).as("__n"))
    val sharded = ranked.crossJoin(broadcast(n))
      .withColumn("shard_id",
        expr(s"(__rank - 1) div ((__n + ${nShards - 1}) div $nShards)"))
    val zones = sharded.groupBy("shard_id").agg(
      count(lit(1)).as("n_rows"),
      min("__k").as("min_key"),
      max("__k").as("max_key"))
    val w = Window.orderBy("shard_id") // shards-sized metadata window
    zones
      .withColumn("clean_cut",
        (coalesce(lag("max_key", 1).over(w), lit(Long.MinValue))
          < col("min_key")).cast("int"))
      .select("shard_id", "n_rows", "min_key", "max_key", "clean_cut")
  }
}
