package graft.text

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class LineDedupSpec extends SparkSpecBase {

  private lazy val out =
    graft.queries.TrainingData.queries("x79_line_dedup")(spark, sfDir).cache()

  test("boilerplate lines (df > 5%) are gone from every document") {
    assert(out.filter(col("clean").contains("subscribe to our newsletter")).count() === 0)
    assert(out.filter(col("clean").contains("follow us on social media")).count() === 0)
  }

  test("unique lines survive and reassembly preserves original order") {
    // every doc keeps exactly its prefix line then its signature line,
    // in that order (pos 0 then pos 3/2) — check structure on all docs
    val bad = out.filter(
      !col("clean").endsWith(concat(lit("signature of doc "), col("doc_id").cast("string"))) ||
      col("n_kept") =!= 2)
    assert(bad.count() === 0, bad.take(3).mkString("; "))
    // and the prefix comes FIRST: clean must not START with the signature
    assert(out.filter(col("clean").startsWith("signature of doc")).count() === 0)
  }

  test("no document is lost by the cut") {
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(out.count() === nDocs)
  }
}
