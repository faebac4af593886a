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

  /** POSITIVE control (r12 verdict #1): the generated testdata is
    * referentially clean, so the two tests above can only ever compare
    * 0 == 0 — a broken anti-join (wrong key, flipped direction) would
    * stay green. Planted orphans with EXACT per-edge counts make the
    * spec fail for any such defect. */
  test("planted orphans surface with exact nonzero per-edge counts in both forms") {
    import spark.implicits._
    val fact = Seq(
      (1L, Option(10L), Option(100L)),
      (2L, Option(10L), Option(200L)),
      (3L, Option(20L), Option(999L)),    // orphan on edge b
      (4L, Option(77L), Option(100L)),    // orphan on edge a
      (5L, Option(88L), Option(200L)),    // orphan on edge a
      (6L, Option.empty[Long], Option(100L))) // NULL fk: orphan on a in BOTH forms
      .toDF("id", "fk_a", "fk_b")
    val dimA = Seq(10L, 20L, 30L).toDF("pk_a") // 30 has no fact rows
    val dimB = Seq(100L, 200L).toDF("pk_b")
    assert(QualityChecks.fkOrphans(fact, dimA, "fk_a", "pk_a").count() === 3L)
    assert(QualityChecks.fkOrphans(fact, dimB, "fk_b", "pk_b").count() === 1L)
    val onePass = QualityChecks.orphanSummaryOnePass(fact, Seq(
      ("orph_a", dimA, "fk_a", "pk_a"),
      ("orph_b", dimB, "fk_b", "pk_b"))).collect()(0)
    assert(onePass.getLong(0) === 3L, "one-pass edge-a count")
    assert(onePass.getLong(1) === 1L, "one-pass edge-b count")
    // the FLIPPED direction (dim keys without fact rows) counts 1, not 3 —
    // the exact-count assertions above pin key AND direction
    assert(QualityChecks.fkOrphans(dimA, fact, "pk_a", "fk_a").count() === 1L)
  }
}
