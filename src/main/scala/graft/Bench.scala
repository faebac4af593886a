package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query seconds.
  *
  * Two passes: an untimed warmup (Catalyst planning, whole-stage codegen
  * compilation, JIT) and a timed pass. Caches are cleared between passes
  * so the timed pass re-does all real work (including rebuilding any
  * DataFrame caches a query uses) — it measures steady-state execution,
  * not first-plan janino compile time, which a long-lived cluster
  * amortizes to zero.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case _: Throwable => }
    }
    spark.catalog.clearCache()
    val results = names.map { n =>
      val t0 = System.nanoTime()
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case _: Throwable => -1L }
      n -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
