package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialize-once dedup plane — the service shape of the near-dup
  * stack.
  *
  * The gate queries (x17 clusters, x38 keepers, x41 sketch accuracy,
  * k7 curation) are deliberately self-contained, so each rebuilds
  * shingles → signatures → band candidates → verified pairs from raw
  * text. A curation service runs all of those consumers over ONE
  * corpus snapshot; rebuilding the stack per consumer multiplies the
  * dominant cost (the shingle explode and signature aggregation are
  * full corpus passes — at 100 TB, each rebuild is the bill). The
  * plane builds the four shared stages once, caches them, and every
  * consumer is a join off the cached frames.
  *
  * Lifecycle is explicit (the ivfIndex discipline): [[DedupPlane.build]]
  * caches exactly four frames and [[unpersist]] releases all of them —
  * spec-checked against the session CacheManager, so a plane cannot
  * leak storage in a long-running service.
  */
final class DedupPlane private[dedup] (
    docs: DataFrame,
    /** (doc_id, sh): distinct 3-gram shingles — one text pass. */
    val shingles: DataFrame,
    /** (doc_id, mh0..mh31): MinHash signatures off the cached shingles. */
    val signatures: DataFrame,
    /** (doc_a, doc_b): LSH band candidates, va < vb once. */
    val candidates: DataFrame,
    /** (doc_a, doc_b, jaccard): exact-verified near-dup pairs. */
    val pairs: DataFrame) {

  /** Min-label near-dup components over the verified pairs (x17
    * semantics: 2-hop propagation by default). */
  def components(iters: Int = 2): DataFrame =
    Dedup.nearDupComponents(pairs, docs, iters)

  /** Quality-argmax keeper per component (x38 semantics). */
  def keepers(scored: DataFrame, scoreCol: String, iters: Int = 2): DataFrame =
    Dedup.componentKeepers(components(iters), scored, scoreCol)

  /** MinHash est-vs-exact sketch-accuracy report (x41 semantics). */
  def accuracy: DataFrame =
    Dedup.accuracyFrom(shingles, signatures, candidates)

  /** Release every cache the build registered. */
  def unpersist(): Unit =
    Seq(pairs, candidates, signatures, shingles).foreach(_.unpersist())

  /** Persist the four stages as parquet under `dir` — the index
    * artifact a curation service ships between build and serve.
    * [[DedupPlane.read]] reconstructs a plane whose consumers scan the
    * parquet instead of recomputing the pipeline; results are
    * bit-identical because the consumers are the same plans over the
    * same rows (spec-checked through a write/read round trip). */
  def write(dir: String): Unit = {
    shingles.write.mode("overwrite").parquet(s"$dir/shingles")
    signatures.write.mode("overwrite").parquet(s"$dir/signatures")
    candidates.write.mode("overwrite").parquet(s"$dir/candidates")
    pairs.write.mode("overwrite").parquet(s"$dir/pairs")
  }
}

object DedupPlane {

  /** Build and cache the shared stages: one shingle explode, one
    * signature aggregation over it, the band-bucket candidate join,
    * and the exact verification — each stage feeding the next off its
    * cache. Consumers ([[DedupPlane.components]], keepers, accuracy)
    * produce bit-identical results to the self-contained query paths
    * (spec-checked), because they ARE the same plans over shared
    * inputs. */
  def build(docs: DataFrame, threshold: Double = 0.5): DedupPlane = {
    val sh = Dedup.docShingles(docs).cache()
    val sigs = Dedup.minhashSignatures(sh).cache()
    val cand = Dedup.candidatePairs(Dedup.bandTable(sigs)).cache()
    val pairs = Dedup.verifiedPairs(sh, cand, threshold).cache()
    new DedupPlane(docs, sh, sigs, cand, pairs)
  }

  /** Reopen a plane persisted by [[DedupPlane#write]]: every stage is a
    * parquet scan, nothing is cached (the files ARE the materialized
    * state), so consumers probe the standing index the way a service
    * would — without a per-query rebuild of shingles → signatures →
    * candidates → pairs. */
  def read(spark: SparkSession, dir: String, docs: DataFrame): DedupPlane =
    new DedupPlane(docs,
      spark.read.parquet(s"$dir/shingles"),
      spark.read.parquet(s"$dir/signatures"),
      spark.read.parquet(s"$dir/candidates"),
      spark.read.parquet(s"$dir/pairs"))
}
