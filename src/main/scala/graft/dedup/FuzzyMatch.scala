package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity-resolution fuzzy matching — the warehouse-side companion of
  * the document dedup suite (customer/transaction dims carry free-text
  * names, and "same entity, slightly different spelling" is the classic
  * dim-dedup problem).
  *
  * Scale shape: candidate generation is a *blocked* equi-join — block =
  * (first character, length band) — so the edit-distance verify runs on
  * Σ per-block² pairs, never n². Blocking on a cheap deterministic key
  * is the same trick as [[Dedup]]'s LSH bands and
  * [[graft.sim.Similarity.blockedCosinePairs]]'s label key.
  */
object FuzzyMatch {

  /** Candidate pairs within the same (first-char, last-char, length-band)
    * block, verified by levenshtein ≤ maxDist. First char alone is a bad
    * block on ID-like corpora (shared prefixes collapse everything into
    * one block); the trailing character splits those. Matches that edit
    * the blocking characters themselves are missed — the documented
    * recall trade of single-key blocking; production ER adds a second
    * pass with a shifted key. */
  def blockedNamePairs(df: DataFrame, idCol: String, nameCol: String,
                       maxDist: Int = 2, lenBand: Int = 4): DataFrame = {
    val keyed = df.select(
      col(idCol).as("id"),
      lower(trim(col(nameCol))).as("name"))
      .withColumn("blk_c", substring(col("name"), 1, 1))
      .withColumn("blk_e", substring(col("name"), -1, 1))
      .withColumn("blk_l", (length(col("name")) / lenBand).cast("int"))
    val a = keyed.select(col("id").as("id_a"), col("name").as("name_a"),
      col("blk_c"), col("blk_e"), col("blk_l"))
    val b = keyed.select(col("id").as("id_b"), col("name").as("name_b"),
      col("blk_c"), col("blk_e"), col("blk_l"))
    a.join(b, Seq("blk_c", "blk_e", "blk_l")).filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "name_a", "name_b", "dist")
  }
}
