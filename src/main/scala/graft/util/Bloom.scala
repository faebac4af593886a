package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational Bloom filter (Bloom 1970) — the membership pre-screen of
  * the sketch family: k md5-salted bit positions in an m-bit space per
  * key; a probe MIGHT be a member iff all k bits are set. No false
  * negatives ever (a member's bits are all set by construction —
  * spec-pinned), false positives at the classic (1−e^{−kn/m})^k rate.
  *
  * The production role here is the cheap first pass of benchmark
  * decontamination: the benchmark shingle set folds to ≤ m DISTINCT
  * SET BITS (metadata, broadcast — compare the full shingle set a
  * semi-join ships), the corpus probes against those bits, and only
  * bloom-positive shingles proceed to the exact X35 check. All md5 —
  * engine-bit-identical. */
object Bloom {

  /** Filter geometry: m = 65536 bits (four md5 hex digits), k = 3
    * salted hashes — ~11 % fill at the gate corpus's benchmark size,
    * the classic ≈0.1 % FP regime; the set-bit table stays ≤ m rows
    * of broadcast metadata. Shared with the generated oracle. */
  val NumBits = 65536
  val NumHashes = 3

  /** The salt-th bit position of a key — public so per-shard bloom
    * builders (x132) reuse the exact geometry the oracle replays. */
  def bit(salt: Int, key: Column): Column =
    conv(substring(md5(concat(lit(s"bf$salt|"), key)), 1, 4), 16, 10).cast("int")

  /** The ≤ m-row distinct set-bit table of a key set. */
  def bits(keys: DataFrame, keyCol: String): DataFrame =
    keys.select(explode(array((0 until NumHashes).map(i =>
      bit(i, col(keyCol))): _*)).as("bit")).distinct()

  /** Probe rows that PASS the filter (all k bits set) — the candidate
    * set forwarded to an exact check. Keeps every column of `probes`. */
  def passing(probes: DataFrame, bitsDf: DataFrame, keyCol: String): DataFrame = {
    val cols = probes.columns
    probes
      .select(cols.map(col) :+ explode(array((0 until NumHashes).map(i =>
        bit(i, col(keyCol))): _*)).as("__bit"): _*)
      .join(broadcast(bitsDf.withColumnRenamed("bit", "__bit")), Seq("__bit"))
      .groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("__k"))
      .filter(col("__k") === NumHashes)
      .drop("__k")
  }
}
