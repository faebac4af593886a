package graft.plans

import graft.SparkSpecBase

/** Whole-surface generalization of the WindowScaleSafetySpec ban: NO
  * query on the SparkEntry surface may plan an un-partitioned Window —
  * the one plan shape guaranteed to funnel the corpus through a single
  * task at 100 TB. Every new query is linted automatically the moment
  * it is registered; a regression to a global rank/running-sum shape
  * fails here by name.
  *
  * Exemptions, by documented design: the TopFrac histogram-refinement
  * queries, whose single un-partitioned Window runs over the
  * METADATA-SIZED coarse histogram (≤ score-range/coarseDiv rows),
  * never the corpus — see util/TopFrac.scala and the r8 verdict note.
  */
class SurfaceWindowLintSpec extends SparkSpecBase {

  private val exempt = Set("x52_quality_cut", "x77_quality_deciles")

  test("no surface query plans an un-partitioned Window (TopFrac histogram exemptions aside)") {
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => exempt(q._1))
      .flatMap { case (n, fn) =>
        val wins =
          try fn(spark, sfDir).queryExecution.optimizedPlan.collect {
            case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w
          } catch {
            case e: Throwable => fail(s"$n failed to plan: ${e.getMessage}")
          }
        if (wins.nonEmpty) Some(n) else None
      }
    spark.catalog.clearCache()
    assert(offenders.isEmpty,
      s"un-partitioned corpus Window planned by: ${offenders.mkString(", ")}")
  }
}
