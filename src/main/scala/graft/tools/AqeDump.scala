package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main: run one registered query to completion and print its
  * AQE-FINAL executed plan (PlanDump fingerprints the planning-time
  * initial plan on purpose; adjudicating a runtime build-side flip or
  * coalesced-partition count needs the post-execution shape). Not on any
  * query path. */
object AqeDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.queryExecution.toRdd.count()
      println(s"========== $n (AQE final) ==========")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
