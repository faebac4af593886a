package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for the 100 TB path.
  *
  * AQE's skew-join split handles storage-level skew in sort-merge joins
  * automatically; these utilities cover what AQE cannot re-plan:
  * aggregation state that concentrates on hot keys, and broadcast-less
  * joins where one side's hot key floods a single task.
  *
  * Everything here is pure DataFrame → DataFrame and provably equivalent
  * to the unsalted form (spec-checked).
  */
object Skew {

  /** Salted equi-join: the big side gets a salt in [0, saltFactor); the
    * small side is replicated saltFactor× with every salt value, so a hot
    * key's rows spread over saltFactor tasks instead of one. Use when the
    * small side is too big to broadcast but small enough to replicate.
    *
    * `smallHint` (e.g. Some("shuffle_hash")) attaches a join-strategy
    * hint to the replicated side — at test scale the replicated dim
    * would still broadcast, which silently removes the very shuffle the
    * salt exists to spread; the hint pins the shuffled strategy the
    * 100 TB regime forces anyway. */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
                 saltFactor: Int = 8, smallHint: Option[String] = None): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)))
    val replicated = small.withColumn("__salt",
      explode(lit((0L until saltFactor.toLong).toArray)))
    val replicatedSmall = smallHint.fold(replicated)(replicated.hint(_))
    saltedBig.join(replicatedSmall,
        saltedBig(bigKey) === replicatedSmall(smallKey) &&
        saltedBig("__salt") === replicatedSmall("__salt"))
      .drop("__salt")
  }

  /** Two-phase exact distinct count per key: phase 1 dedups (key, value)
    * pairs — the salt is the value itself, spreading a hot key's state —
    * phase 2 counts survivors. Equivalent to countDistinct but the
    * per-key state never concentrates in one task. */
  def twoPhaseDistinct(df: DataFrame, key: String, valueCol: String): DataFrame =
    df.select(key, valueCol).distinct()
      .groupBy(key).agg(count(lit(1)).as(s"distinct_$valueCol"))

  /** Hot-key diagnostic: the key-frequency histogram that DECIDES whether
    * a join/agg key needs salting at all. Per-key row counts collapse to
    * log2 buckets (`floor(log2(count))` via the binary-string length —
    * exact integer arithmetic, no float log), so the result is ~64 rows
    * regardless of key cardinality: bucket, how many keys land there,
    * their min/max counts, and the total row mass they carry. A healthy
    * uniform key shows one or two adjacent buckets; a long tail into
    * high buckets is the signature of a key that will flood single tasks
    * in a shuffle join. One map-side-combined shuffle on the key, then a
    * ~cardinality-sized aggregate to ≤64 rows — the profile itself can
    * never be the bottleneck. */
  def keyHistogram(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .withColumn("log2_bucket", (length(bin(col("cnt"))) - 1).cast("int"))
      .groupBy("log2_bucket")
      .agg(count(lit(1)).as("n_keys"),
        min("cnt").as("min_rows"),
        max("cnt").as("max_rows"),
        sum("cnt").as("sum_rows"))
      .orderBy("log2_bucket")

  /** Two-phase collect_set for skewed keys: partial sets per (key, salt),
    * then a merge pass — bounds any single task's state to ~1/saltFactor
    * of the hot key's values. */
  def twoPhaseCollectSet(df: DataFrame, key: String, valueCol: String,
                         saltFactor: Int = 8): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(valueCol)), lit(saltFactor.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(collect_set(col(valueCol)).as("__partial"))
      .groupBy(key)
      .agg(array_sort(array_distinct(flatten(collect_list(col("__partial")))))
        .as(s"set_$valueCol"))
}
