package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextFunctions
import graft.dedup.Dedup

/** End-to-end curation run for the documents plane — the training-data
  * analog of [[PipelineRunner]] (k6): compute every per-document
  * curation signal, join the near-dup keeper flag, derive the final
  * keep/drop verdict, gate on corpus-level QC, write the wide curation
  * table partitioned by detected language, and read it back. This is
  * the table a data-mix owner actually consumes: one row per document
  * with every signal that justified its keep/drop.
  *
  * Scale notes: the signal plane is one tokenization pass per family
  * (withTextSignals' shared-traversal discipline), the dedup plane is
  * the banded LSH pipeline (no all-pairs anywhere), and the final join
  * keys everything on doc_id — three shuffles total on the wide side.
  * The parquet write partitions by language, which is what makes the
  * downstream per-language budget/mix reads partition-pruned. */
object CurationRunner {

  final case class Report(nDocs: Long, nRows: Long, nKept: Long, qcPassed: Boolean)

  val AllowedLangs: Seq[String] = Seq("de", "en", "es", "fr")
  val QualityFloor = 0.5
  val TokenBand: (Int, Int) = (20, 200)
  val RepCap = 0.2

  /** The wide per-document curation table (not yet written): identity
    * and quality signals, repetition ratio, near-dup component/keeper,
    * and the composite keep verdict. */
  def curate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val signals = TextFunctions.withTextSignals(docs)
      .select("doc_id", "lang_detected", "quality", "n_tokens")
    val sh = col("sh")
    val total = size(sh)
    val rep = docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
      .select(col("doc_id"), TextFunctions.shingles(col("t"), 3).as("sh"))
      .select(col("doc_id"),
        round(when(total > 0,
          (total - size(array_distinct(sh))).cast("double") / total.cast("double"))
          .otherwise(0.0), 6).as("rep_ratio"))
    val labels = Dedup.nearDupComponents(Dedup.minhashNearDups(docs, 0.5), docs)
      .select(col("doc_id"), col("component"), col("is_keeper"))
    signals.join(rep, Seq("doc_id")).join(labels, Seq("doc_id"))
      .withColumn("keep",
        (col("lang_detected").isin(AllowedLangs: _*) &&
          col("quality") >= QualityFloor &&
          col("n_tokens").between(TokenBand._1, TokenBand._2) &&
          col("rep_ratio") <= RepCap &&
          col("is_keeper") === 1).cast("int"))
  }

  /** Write the curation table under `out/curation` (partitioned by
    * detected language), read it back, and QC-gate: row count must
    * equal the corpus, doc_ids must stay unique, and the keep verdict
    * must neither drop everything nor keep everything. */
  def run(spark: SparkSession, dir: String, out: String): Report = {
    curate(spark, dir).write.mode("overwrite")
      .partitionBy("lang_detected").parquet(s"$out/curation")
    val back = spark.read.parquet(s"$out/curation")
    val nDocs = Tables.documents(spark, dir).count()
    val row = back.agg(
      count(lit(1)).as("n"),
      countDistinct(col("doc_id")).as("nd"),
      sum("keep").as("kept")).first()
    val (n, nd, kept) = (row.getLong(0), row.getLong(1), row.getLong(2))
    Report(nDocs, n, kept,
      qcPassed = n == nDocs && nd == nDocs && kept > 0 && kept < n)
  }
}
