package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `org.apache.spark.sql`-private plan↔DataFrame wiring.
  *
  * `Dataset.ofRows` is `private[sql]` in Spark 4; a custom plan
  * transform (graft.plans.AggRewrite) that produces a rewritten
  * LogicalPlan needs exactly this one hook to hand it back to the
  * session. The standard extension-library pattern: one accessor in
  * the sql namespace, nothing else lives here.
  */
object PlanUtil {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
