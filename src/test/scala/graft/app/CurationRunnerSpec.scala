package graft.app

import graft.SparkSpecBase
import graft.Tables
import org.apache.spark.sql.functions._
import java.nio.file.Files

class CurationRunnerSpec extends SparkSpecBase {

  test("curation run is QC-gated, one row per doc, keep implies every rule") {
    val out = Files.createTempDirectory("graft_curation_spec").toString
    val r = CurationRunner.run(spark, sfDir, out)
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(r.qcPassed, s"QC gate failed: $r")
    assert(r.nRows === nDocs)
    assert(r.nKept > 0 && r.nKept < nDocs)

    val back = spark.read.parquet(s"$out/curation")
    // lang partition column survives the round trip
    assert(back.select("lang_detected").distinct().count() >= 2)
    // every kept row satisfies the full rule set
    val violations = back.filter(col("keep") === 1).filter(
      !col("lang_detected").isin(CurationRunner.AllowedLangs: _*) ||
        col("quality") < CurationRunner.QualityFloor ||
        col("n_tokens") < CurationRunner.TokenBand._1 ||
        col("n_tokens") > CurationRunner.TokenBand._2 ||
        col("rep_ratio") > CurationRunner.RepCap ||
        col("is_keeper") =!= 1)
    assert(violations.count() === 0)
    // near-dup losers are never kept: each component keeps at most one doc
    val multiKeep = back.filter(col("keep") === 1)
      .groupBy("component").count().filter(col("count") > 1)
    assert(multiKeep.count() === 0)
  }
}
