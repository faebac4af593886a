package graft.queries

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Behavior pins for the third round-12 tranche (X223-X225): the
  * streamed ingest-dedup's cross-batch state survival, partition
  * pruning in BOTH epochs of the evolved layout, and LPA's synchronous
  * determinism. Value correctness is the oracle hash gate's job. */
class R12cTrancheSpec extends SparkSpecBase {

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sfDir)

  private def fp = graft.text.TextFunctions.fingerprint(col("text"))

  test("x198: output fps unique + equal the batch EXCEPT; clone rejection crosses batches non-vacuously") {
    val out = run("x198_stream_dedup").collect().map(_.getString(0))
    assert(out.length == out.distinct.length,
      "a repeated fp means dedup state did NOT survive the micro-batch boundary")
    val docs = Tables.documents(spark, sfDir)
    val hist = docs.filter(pmod(col("doc_id"), lit(3L)) === 0)
      .select(fp.as("fp")).distinct()
    val strm = docs.filter(pmod(col("doc_id"), lit(3L)) =!= 0)
      .select(fp.as("fp")).distinct()
    val expect = strm.except(hist).collect().map(_.getString(0)).sorted
    assert(out.toSeq == expect.toSeq,
      "streamed ingest-dedup must equal the batch anti-join + distinct")
    // non-vacuous cross-batch test: ≥1 batch-1 clone carries an fp that
    // was EMITTED (not hist-rejected) in batch 0 — its batch-1
    // rejection can only come from carried dedup state
    val cloneFps = docs.filter(
        pmod(col("doc_id"), lit(3L)) =!= 0 && pmod(col("doc_id"), lit(7L)) === 1)
      .select(fp.as("fp")).distinct()
    assert(cloneFps.except(hist).count() > 0,
      "no clone fp survives the historical screen — the gate would not exercise cross-batch state")
  }

  test("x199: both epochs' scans prune at the partition listing (with unfiltered negative control)") {
    run("x199_partition_evolution").collect() // materializes the two layouts
    val root = Warehouse.scratch("partevol_orders", sfDir)
    def pf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.flatMap(_.partitionFilters)
    val m = spark.read.parquet(root + "/m")
    val d = spark.read.parquet(root + "/d")
    assert(pf(m.filter(col("o_month") >= "2000-11"))
      .exists(_.toString.contains("o_month")),
      "month-epoch predicate must land in the scan's partitionFilters")
    assert(pf(d.filter(col("o_day") < "2001-03-01"))
      .exists(_.toString.contains("o_day")),
      "day-epoch predicate must land in the scan's partitionFilters")
    // negative control: the matcher reports nothing on unfiltered scans,
    // so the two assertions above cannot pass vacuously
    assert(pf(m).isEmpty && pf(d).isEmpty,
      "unfiltered epoch scans must carry no partition filters")
  }

  test("x200: round 1 from singleton labels is min-neighbor; 3-round assignment is deterministic") {
    val op = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = op.join(
        op.select(col("l_orderkey").as("o2"), col("l_partkey").as("p2")),
        col("l_orderkey") === col("o2") && col("l_partkey") < col("p2"))
      .groupBy(col("l_partkey").as("src"), col("p2").as("dst"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)
      .select("src", "dst")
    // with all-distinct initial labels every neighbor label counts 1,
    // so the (count desc, min label) pick degenerates to min(neighbor)
    val r1 = graft.operators.LabelPropagation.run(edges, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val und = edges.unionByName(
      edges.select(col("dst").as("src"), col("src").as("dst")))
    val minNbr = und.groupBy("src").agg(min("dst").as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == minNbr, "round 1 must equal the min-neighbor assignment")
    val a = run("x200_lpa_communities").collect().map(_.toSeq)
    val b = run("x200_lpa_communities").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq, "synchronous LPA must be run-to-run deterministic")
    val nodes = und.select("src").distinct().collect().map(_.getLong(0)).toSet
    assert(a.forall(r => nodes(r.head.asInstanceOf[Long])) &&
           a.forall(r => nodes(r(1).asInstanceOf[Long])),
      "labels must be node ids from the graph")
  }
}
