package graft.plans

import graft.SparkSpecBase

/** Whole-surface sibling of SurfaceWindowLintSpec — one physical-plan
  * walk over every SparkEntry query, two lints:
  *
  *   1. NO CartesianProductExec. The surface uses crossJoin
  *      deliberately — but always against a BROADCAST 1-row scalar
  *      frame (j21/j27/x87's exchange-reuse shape), which plans
  *      BroadcastNestedLoopJoin. A crossJoin that loses its broadcast
  *      (a refactor dropping the hint, a threshold change) silently
  *      degrades to CartesianProduct — corpus × corpus at 100 TB.
  *
  *   2. NO exact-`percentile` aggregate buffer. Its
  *      TypedImperativeAggregate collects a group's ENTIRE value set
  *      into one reducer buffer — the single-task funnel GroupedQuantiles
  *      / ExactQuantiles exist to replace (a17/x85, measured 20.6 s and
  *      an OOM shape at 100 TB). approx_percentile (bounded t-digest)
  *      stays legal — x83 audits it on purpose. */
class SurfaceCartesianLintSpec extends SparkSpecBase {

  test("no surface query plans a CartesianProduct or an exact-percentile buffer") {
    val pctl = "(?<!approx_)percentile\\(".r
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .flatMap { case (n, fn) =>
        val plan =
          try fn(spark, sfDir).queryExecution.sparkPlan
          catch {
            case e: Throwable => fail(s"$n failed to plan: ${e.getMessage}")
          }
        val hasCartesian = plan.collectFirst {
          case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
        }.isDefined
        val hasPercentile = pctl.findFirstIn(plan.toString).isDefined
        (if (hasCartesian) Some(s"$n(cartesian)") else None) ++
          (if (hasPercentile) Some(s"$n(percentile-buffer)") else None)
      }
    spark.catalog.clearCache()
    assert(offenders.isEmpty,
      s"plan lint failures: ${offenders.mkString(", ")}")
  }
}
