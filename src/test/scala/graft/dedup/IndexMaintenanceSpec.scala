package graft.dedup

import graft.SparkSpecBase
import graft.Tables
import org.apache.spark.sql.functions._

/** The persisted face of the x54 delta-dedup story: in production the
  * corpus side's MinHash signatures live as a STORED index (parquet/
  * table), appended per ingest batch — never recomputed from corpus
  * text. These tests pin the properties that make that index safe:
  * signatures computed incrementally per batch are bit-identical to a
  * full recompute (per-doc intrinsic), an append replay dedups to the
  * same index (idempotent maintenance), and the banded candidate join
  * off the STORED index equals the one computed from text. */
class IndexMaintenanceSpec extends SparkSpecBase {

  private lazy val docs = Tables.documents(spark, sfDir).cache()
  private val split = 250L

  private def sigs(df: org.apache.spark.sql.DataFrame) =
    Dedup.minhashSignatures(Dedup.docShingles(df))

  test("per-batch signature builds are bit-identical to the full recompute") {
    val full = sigs(docs)
    val batched = sigs(docs.filter(col("doc_id") < split))
      .unionByName(sigs(docs.filter(col("doc_id") >= split)))
    assert(batched.except(full).count() === 0)
    assert(full.except(batched).count() === 0)
  }

  test("append replay dedups to the same stored index; delta off the index matches text") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sig_index_").toString
    try {
      val corpus = docs.filter(col("doc_id") < split)
      val batch = docs.filter(col("doc_id") >= split)
      sigs(corpus).write.mode("overwrite").parquet(dir)
      // the SAME batch appended twice (an at-least-once replay)
      sigs(batch).write.mode("append").parquet(dir)
      sigs(batch).write.mode("append").parquet(dir)
      // maintenance read: one row per doc survives (signatures are
      // deterministic, so replayed rows are exact duplicates)
      val index = spark.read.parquet(dir).dropDuplicates("doc_id")
      assert(index.count() === docs.count())
      // candidates from the STORED corpus slice of the index vs from text
      val fromIndex = Dedup.bandTable(index.filter(col("doc_id") < split))
      val fromText = Dedup.bandTable(sigs(corpus))
      assert(fromIndex.except(fromText).count() === 0)
      assert(fromText.except(fromIndex).count() === 0)
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)): Unit
  }
}
