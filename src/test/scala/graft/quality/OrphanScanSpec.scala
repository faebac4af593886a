package graft.quality

import graft.SparkSpecBase
import graft.queries.Quality
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Guards the one-scan contract of the FK-orphan summary: the r4 plan
  * built one anti-join aggregate per edge and rescanned lineitem (the
  * biggest table) three times — at 100 TB that is 3× the dominant cost.
  * The folded plan left-joins the three broadcast dim key sets in ONE
  * pass and counts every edge in a single aggregate. */
class OrphanScanSpec extends SparkSpecBase {

  private def scansOf(plan: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
    plan.collect {
      case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
      case s: FileSourceScanExec =>
        Seq(s.relation.location.rootPaths.mkString(","))
    }.flatten

  test("q_fk_orphan_summary scans lineitem exactly once") {
    val df = Quality.queries("q_fk_orphan_summary")(spark, sfDir)
    val liScans = scansOf(df.queryExecution.executedPlan)
      .count(_.contains("lineitem"))
    assert(liScans === 1, s"expected ONE lineitem scan, found $liScans")
  }

  test("one-pass orphan counts equal the per-edge anti-join counts") {
    import graft.Tables
    val onePass = QualityChecks.orphanSummaryOnePass(Tables.lineitem(spark, sfDir), Seq(
      ("e1", Tables.orders(spark, sfDir), "l_orderkey", "o_orderkey"),
      ("e2", Tables.part(spark, sfDir), "l_partkey", "p_partkey"))).collect()(0)
    val antiJoin = QualityChecks.orphanSummary(Seq(
      ("e1", Tables.lineitem(spark, sfDir), Tables.orders(spark, sfDir), "l_orderkey", "o_orderkey"),
      ("e2", Tables.lineitem(spark, sfDir), Tables.part(spark, sfDir), "l_partkey", "p_partkey"))).collect()(0)
    assert(onePass.getLong(0) === antiJoin.getLong(0))
    assert(onePass.getLong(1) === antiJoin.getLong(1))
  }
}
