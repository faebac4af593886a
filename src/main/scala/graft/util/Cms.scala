package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch over a key column, relationally (Cormode &
  * Muthukrishnan 2005) — the bounded-memory frequency estimator that
  * completes the engine's sketch family (HLL for distincts, MinHash
  * for set overlap, SimHash for near-identity, CMS for frequencies):
  * d independent md5-salted hash rows × w counter buckets, point
  * estimate = min over the d counters, with the one-sided guarantee
  * est ≥ true (collisions only ever ADD — spec-pinned).
  *
  * Shuffle structure, sized for 100 TB: occurrences collapse to the
  * key-TYPE count table first (one map-combined shuffle — the x65
  * vocabulary collapse), the d×(type,bucket) explode runs over
  * VOCABULARY rows, and the counter table is d·w rows of METADATA —
  * broadcast to any consumer. All hashing md5, all counts integer —
  * bit-identical in any engine. */
object Cms {

  /** Sketch geometry: d hash rows × w buckets (md5 two-hex-digit
    * buckets — w=256). Shared with the generated oracle. */
  val Depth = 4
  val Width = 256

  private def bucket(salt: Int, key: Column): Column =
    conv(substring(md5(concat(lit(s"cms$salt|"), key)), 1, 2), 16, 10).cast("int")

  /** (i, bucket, c): the d·w counter table of a (key, cnt) count
    * table. `counts` must be (key string, cnt long) — typically the
    * collapsed key-type table. */
  def counters(counts: DataFrame, keyCol: String, cntCol: String): DataFrame =
    counts.select(
        explode(array((0 until Depth).map(i =>
          struct(lit(i).as("i"), bucket(i, col(keyCol)).as("bucket"))): _*)).as("h"),
        col(cntCol).as("cnt"))
      .groupBy(col("h.i").as("i"), col("h.bucket").as("bucket"))
      .agg(sum("cnt").as("c"))

  /** Point estimates for a set of probe keys against a counter table:
    * (key, est) with est = min over the d rows' counters. */
  def estimate(probes: DataFrame, ctrs: DataFrame, keyCol: String): DataFrame = {
    val hashed = probes.select(col(keyCol),
      explode(array((0 until Depth).map(i =>
        struct(lit(i).as("i"), bucket(i, col(keyCol)).as("bucket"))): _*)).as("h"))
      .select(col(keyCol), col("h.i").as("i"), col("h.bucket").as("bucket"))
    hashed.join(broadcast(ctrs), Seq("i", "bucket"))
      .groupBy(keyCol).agg(min("c").as("est"))
  }
}
