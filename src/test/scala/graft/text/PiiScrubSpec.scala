package graft.text

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

class PiiScrubSpec extends SparkSpecBase {

  private lazy val out =
    graft.queries.TrainingData.queries("x78_pii_scrub")(spark, sfDir).cache()

  test("no false negatives: the scrubbed text contains zero pattern matches") {
    val residue = out.select(
      sum(PiiScrub.count(col("clean"), PiiScrub.EmailPattern)).as("e"),
      sum(PiiScrub.count(col("clean"), PiiScrub.IpPattern)).as("i"),
      sum(PiiScrub.count(col("clean"), PiiScrub.PhonePattern)).as("p")).first()
    assert(residue.getLong(0) === 0L && residue.getLong(1) === 0L &&
           residue.getLong(2) === 0L, s"PII survived the scrub: $residue")
  }

  test("scrub is idempotent (placeholders are not re-matchable)") {
    val twice = out.select(col("clean"),
      PiiScrub.scrub(col("clean")).as("clean2"))
    assert(twice.filter(col("clean") =!= col("clean2")).count() === 0)
  }

  test("audit counts follow the plant rule exactly") {
    val bad = out.filter(
      col("n_emails") =!= when(col("doc_id") % 3 === 0, 2).otherwise(1) ||
      col("n_phones") =!= when(col("doc_id") % 2 === 0, 1).otherwise(0) ||
      col("n_ips") =!= when(col("doc_id") % 5 === 0, 1).otherwise(0))
    assert(bad.count() === 0, bad.take(3).mkString("; "))
  }

  test("PII-free text passes through unchanged (no false positives on word salad)") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("text"), PiiScrub.scrub(col("text")).as("clean"))
    assert(docs.filter(col("text") =!= col("clean")).count() === 0)
  }
}
