package graft.plans

import graft.SparkSpecBase

/** Whole-surface sibling of SurfaceWindowLintSpec: NO query on the
  * SparkEntry surface may plan a CartesianProductExec. The surface
  * uses crossJoin deliberately — but always against a BROADCAST 1-row
  * scalar frame (j21/j27/x87's exchange-reuse shape), which plans
  * BroadcastNestedLoopJoin. A crossJoin that loses its broadcast (a
  * refactor dropping the hint, a threshold change) silently degrades
  * to CartesianProduct — corpus × corpus at 100 TB — and this lint
  * fails it by name the moment it is registered. */
class SurfaceCartesianLintSpec extends SparkSpecBase {

  test("no surface query plans a CartesianProduct") {
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .flatMap { case (n, fn) =>
        val hasCartesian =
          try fn(spark, sfDir).queryExecution.sparkPlan.collectFirst {
            case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
          }.isDefined
          catch {
            case e: Throwable => fail(s"$n failed to plan: ${e.getMessage}")
          }
        if (hasCartesian) Some(n) else None
      }
    spark.catalog.clearCache()
    assert(offenders.isEmpty,
      s"CartesianProduct planned by: ${offenders.mkString(", ")}")
  }
}
