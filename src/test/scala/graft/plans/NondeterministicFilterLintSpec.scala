package graft.plans

import graft.SparkSpecBase
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

class NondeterministicFilterLintSpec extends SparkSpecBase {
  import spark.implicits._

  private def df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")

  test("flags the reference's O-3 shape: alias mono_id then filter on it") {
    val bad = df.withColumn("fact_id", monotonically_increasing_id())
      .filter(col("fact_id") > 5)
    val e = intercept[AnalysisException] {
      NondeterministicFilterLint.check(bad.queryExecution.analyzed)
    }
    assert(e.getMessage.contains("fact_id"))
    assert(e.getMessage.contains("O-3"))
  }

  test("passes filters on real source columns") {
    val good = df.withColumn("fact_id", monotonically_increasing_id())
      .filter(col("id") > 1)
    NondeterministicFilterLint.check(good.queryExecution.analyzed)
  }

  test("does not flag direct nondeterministic sampling predicates") {
    val sampling = df.filter(rand(42) < 0.5)
    NondeterministicFilterLint.check(sampling.queryExecution.analyzed)
  }
}
