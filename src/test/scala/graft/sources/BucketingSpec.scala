package graft.sources

import graft.SparkSpecBase
import graft.Tables
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Bucketing = the pre-shuffled warehouse layout: both fact and dim
  * written bucketed on the join key join with NO exchange on either
  * side — at 100 TB this deletes the dominant shuffle of every
  * fact⋈fact query. */
class BucketingSpec extends SparkSpecBase {

  test("co-bucketed tables sort-merge-join without a shuffle") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sfDir)
        .write.mode(SaveMode.Overwrite)
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_bucketed")
      Tables.lineitem(spark, sfDir)
        .write.mode(SaveMode.Overwrite)
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_bucketed")
      val joined = spark.table("orders_bucketed")
        .join(spark.table("lineitem_bucketed"), col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // and it is still correct
      assert(joined.count() ===
        Tables.lineitem(spark, sfDir).join(Tables.orders(spark, sfDir),
          col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
    }
  }
}
