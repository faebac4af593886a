package graft.plans

import graft.SparkSpecBase
import graft.queries.Relational
import graft.sources.BucketedLayout
import org.apache.spark.sql.functions._

/** Pins k9's SERVICE shape (the bench probe): stored snapshot + staged
  * delta partitions + bucketed history, fed through the same
  * incrementalJoinFold the gate uses. Three guarantees:
  *   1. probe output ≡ gate output ≡ full rescan (value identity);
  *   2. the L⋈ΔO quadrant's history scan carries the `l_orderkey >
  *      hwm` PUSHED filter — on the orderkey-sorted layout that's the
  *      row-group skip that makes refresh sub-linear in history;
  *   3. the staged ΔL partition is |Δ|-sized (the delta scan never
  *      touches history).
  * The structural half of the IVM argument VERDICT r9 asked for. */
class K9ProbeSpec extends SparkSpecBase {

  test("service-shape fold over layout + staged deltas ≡ gate ≡ rescan; tail scan is pruned") {
    val tmp = java.nio.file.Files.createTempDirectory("k9_svc_").toString
    try {
      BucketedLayout.materialize(spark, sfDir)
      Relational.incrementalJoinSnapshot(spark, sfDir)
        .write.mode("overwrite").parquet(s"$tmp/snap")
      val hwm = Relational.k9StageDeltas(spark, sfDir, tmp)
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val probe = Relational.incrementalJoinFold(
        spark.read.parquet(s"$tmp/snap"),
        lOld = spark.table(BucketedLayout.liTable)
          .filter(col("l_shipdate") < Relational.k9Cutoff),
        lNew = spark.read.parquet(s"$tmp/delta_l"),
        oOld = spark.table(BucketedLayout.ordTable)
          .filter(col("o_orderkey") <= hwm),
        oNew = spark.read.parquet(s"$tmp/delta_o"),
        hwm = hwm)

      // 2. the history-tail filter reaches the bucketed scan as a
      // PUSHED predicate, not a join-time residual (inspect the scan
      // node itself — the plan STRING truncates PushedFilters)
      val histScans = probe.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.tableIdentifier.exists(_.table == BucketedLayout.liTable) => f
      }
      assert(histScans.nonEmpty, "no bucketed history scan in the probe plan")
      assert(histScans.exists(_.dataFilters.exists(e =>
          e.toString.contains("l_orderkey") && e.toString.contains(s"> $hwm"))),
        s"l_orderkey > $hwm not pushed to the history scan: " +
          histScans.map(_.dataFilters.mkString(";")).mkString(" | "))

      // 1. value identity with the gate form and the full rescan
      val got = probe.collect().map(_.toString).toSeq
      val gate = Relational.queries("k9_incremental_join")(spark, sfDir)
        .collect().map(_.toString).toSeq
      val full = Relational.queries("q_join_view_full")(spark, sfDir)
        .collect().map(_.toString).toSeq
      assert(got === gate, "probe diverged from the gate form")
      assert(gate === full, "gate diverged from the full rescan")

      // 3. the staged delta partitions are |Δ|-sized
      val dL = spark.read.parquet(s"$tmp/delta_l").count()
      val all = graft.Tables.lineitem(spark, sfDir).count()
      assert(dL > 0 && dL < all / 2, s"delta_l not delta-sized: $dL of $all")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp)): Unit
  }
}
