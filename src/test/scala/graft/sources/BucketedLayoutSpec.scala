package graft.sources

import graft.SparkSpecBase

/** The bucketed layout's whole value proposition, pinned: same results
  * as the plain layout, with the join-side exchanges AND sorts gone
  * (BucketingSpec covers the raw bucketBy mechanics; this covers the
  * BucketedLayout module the q_bucketed_join surface entry runs). */
class BucketedLayoutSpec extends SparkSpecBase {

  test("bucketed join ≡ plain join, with zero join-side exchanges or sorts") {
    BucketedLayout.materialize(spark, sfDir, buckets = 4)
    try {
      assert(BucketedLayout.bucketedJoinAgg(spark).collect().map(_.toString).toSeq ===
             BucketedLayout.plainJoinAgg(spark, sfDir).collect().map(_.toString).toSeq)
      def exchanges(p: String) = "Exchange".r.findAllIn(p).length
      def sorts(p: String) = "\\bSort\\b".r.findAllIn(p).length
      // fresh, un-executed plans: a single section to count in (the
      // post-execution adaptive string repeats Initial + Final plans)
      val bp = BucketedLayout.bucketedJoinAgg(spark)
        .queryExecution.executedPlan.toString
      val pp = BucketedLayout.plainJoinAgg(spark, sfDir)
        .queryExecution.executedPlan.toString
      // both plans share the agg exchange + the final orderBy (one
      // range exchange + one sort); the plain layout pays 2 more
      // exchanges and 2 more sorts — the join sides
      assert(exchanges(bp) === exchanges(pp) - 2,
        s"bucketed:\n$bp\nplain:\n$pp")
      assert(sorts(bp) === sorts(pp) - 2,
        s"bucketed:\n$bp\nplain:\n$pp")
      assert(bp.contains("SortMergeJoin") && pp.contains("SortMergeJoin"))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${BucketedLayout.liTable}")
      spark.sql(s"DROP TABLE IF EXISTS ${BucketedLayout.ordTable}")
    }
  }

  test("materialize is idempotent across a stale warehouse directory") {
    // simulate a fresh session's catalog over a leftover managed-table
    // directory (the second-Verify-run failure mode: the in-memory
    // catalog is empty but the location exists and is non-empty, which
    // CREATE refuses with LOCATION_ALREADY_EXISTS)
    spark.sql(s"DROP TABLE IF EXISTS ${BucketedLayout.liTable}")
    spark.sql(s"DROP TABLE IF EXISTS ${BucketedLayout.ordTable}")
    val wh = java.net.URI.create(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    val stale = new java.io.File(wh, BucketedLayout.liTable)
    stale.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(stale, "stale.txt").toPath, "leftover")
    try {
      BucketedLayout.materialize(spark, sfDir, buckets = 4)
      assert(BucketedLayout.bucketedJoinAgg(spark).count() > 0)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${BucketedLayout.liTable}")
      spark.sql(s"DROP TABLE IF EXISTS ${BucketedLayout.ordTable}")
    }
  }
}
