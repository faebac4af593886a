package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023) —
  * the hashed n-gram importance weighting that ranks raw-corpus
  * documents by how target-domain-like they are, without training a
  * model: bigram features hash into a fixed bucket table, each bucket
  * gets an importance ratio between the target sample's distribution
  * and the raw corpus's, and a document's weight aggregates the ratios
  * of its own bigrams.
  *
  * Arithmetic is integer end-to-end. Per bucket (add-one smoothed):
  * q_ppb = (t_b+1)·10⁹ div (T+B), p_ppb = (r_b+1)·10⁹ div (R+B),
  * ratio_ppm = q_ppb·10⁶ div p_ppb. The per-doc score
  * Σ c_b·(ratio_ppm − 10⁶) is the FIRST-ORDER expansion of DSIR's
  * log-importance Σ c_b·log(q_b/p_b) around ratio = 1 — monotone per
  * bucket, additive, and free of transcendental ops (log's last ulp is
  * libm-dependent, which would break engine-bit-identity; the known
  * trade-off is that document ranking can differ from log-weights when
  * per-bucket ratios sit far from 1). Worst intermediate
  * (t_b+1)·10⁹ stays in a long to ~9·10⁹ target-side bigrams per
  * shard — the x58 shard-bound discipline.
  *
  * Shuffle structure, sized for 100 TB: occurrences collapse to
  * (doc, bucket, k) FIRST (one map-side-combined shuffle; hot buckets
  * concentrate counts, not rows); the bucket table is B rows of
  * METADATA (aggregate of the collapsed table, broadcast back); the
  * final verdict is one row per document via a broadcast join — the
  * corpus is never re-scanned, windowed over, or collected.
  */
object Dsir {

  /** Feature-space size: bigrams hash into this many buckets (the DSIR
    * paper's hashed n-gram trick — fixed feature dimensionality at any
    * vocabulary size). Two md5 hex digits → 256. */
  val NumBuckets = 256

  private def bucket(w1: Column, w2: Column): Column =
    conv(substring(md5(concat_ws(" ", w1, w2)), 1, 2), 16, 10).cast("int")

  /** (doc_id, n_bigrams, imp_score): per-document importance score of
    * the raw corpus against the target subset selected by `targetPred`
    * (a deterministic predicate over the corpus's own columns — e.g.
    * the curated-language slice). Documents with no bigrams score 0. */
  def importanceWeights(docs: DataFrame, targetPred: Column): DataFrame = {
    // EAGER materialization (r16; was a lazy .cache()): three
    // aggregates below derive from this frame, and the bucket-ratio
    // subtree is built as a broadcast CONCURRENTLY with the per-doc
    // probe side — against a lazy cache the two jobs race to compute
    // the same tokenize+hash plan (the r15 minhashNearDups finding:
    // tasks blocked ~2× CPU on the cache lock rebuilding it).
    val db = BigramLm.docBigrams(docs)
      .select(col("doc_id"), bucket(col("w1"), col("w2")).as("b"), col("k"))
      .groupBy("doc_id", "b").agg(sum("k").as("k"))
      .localCheckpoint(true)
    val buckets = db
      .join(docs.select(col("doc_id"), targetPred.as("is_t")), Seq("doc_id"))
      .groupBy("b").agg(
        sum(when(col("is_t"), col("k")).otherwise(lit(0L))).as("t"),
        sum("k").as("r"))
    val totals = buckets.agg(sum("t").as("tt"), sum("r").as("rt"))
    val ratios = buckets.crossJoin(broadcast(totals))
      .select(col("b"),
        expr(s"(((t + 1) * 1000000000 div (tt + $NumBuckets)) * 1000000) " +
          s"div ((r + 1) * 1000000000 div (rt + $NumBuckets))").as("ratio_ppm"))
    val perDoc = db.join(broadcast(ratios), Seq("b"))
      .groupBy("doc_id").agg(
        sum("k").as("n_bigrams"),
        sum(col("k") * (col("ratio_ppm") - lit(1000000L))).as("imp_score"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("imp_score"), lit(0L)).as("imp_score"))
  }
}
