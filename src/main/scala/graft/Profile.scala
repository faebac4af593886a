package graft
import org.apache.spark.sql.SparkSession

/** Per-query profiling harness: warmed session, two timed runs each —
  * run1 includes plan/codegen cost, run2 shows steady-state. Usage:
  *   sbt "runMain graft.Profile <sfDir> [query...]"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // match Bench: size the generated-class cache for the full surface
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warmup
    val qs = if (names.nonEmpty) names else SparkEntry.queries.keys.toSeq.sorted
    qs.foreach { n =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        // full-plan execution (see Bench): df.count() would let Catalyst
        // prune aggregate columns and eliminate joins under the count
        val cnt = SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
        println(f"[profile] $n%-24s run$i ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($cnt rows)")
      }
    }
    spark.stop()
  }
}
