package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Job/stage-level timing probe for one registered query (guide §1/§7:
  * the Stages-tab read, with the UI disabled): runs the query twice and
  * prints every job's wall time plus each stage's name, task count and
  * executor-side totals — the measurement that says whether a row's
  * cost is one big stage, many small jobs, or scheduling overhead. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
    // A/B hook: SPARK_EXTRA_CONF="k=v;k=v" layers experimental confs
    sys.env.get("SPARK_EXTRA_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); b.config(k, v) })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobStart = scala.collection.concurrent.TrieMap.empty[Int, Long]
    @volatile var enabled = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobStart(j.jobId) = System.nanoTime()
      override def onJobEnd(j: SparkListenerJobEnd): Unit = if (enabled) {
        val dur = jobStart.get(j.jobId)
          .map(t0 => (System.nanoTime() - t0) / 1e9).getOrElse(Double.NaN)
        println(f"[job] id=${j.jobId}%-4d ${dur}%7.3f s")
      }
      override def onStageCompleted(st: SparkListenerStageCompleted): Unit = if (enabled) {
        val i = st.stageInfo
        val run = i.taskMetrics.executorRunTime / 1e3
        val cpu = i.taskMetrics.executorCpuTime / 1e9
        val sr = i.taskMetrics.shuffleReadMetrics.totalBytesRead
        val sw = i.taskMetrics.shuffleWriteMetrics.bytesWritten
        println(f"[stage] ${i.stageId}%-4d tasks=${i.numTasks}%-4d " +
          f"run=${run}%7.2f s cpu=${cpu}%7.2f s shR=${sr}%9d shW=${sw}%9d  ${i.name.takeWhile(_ != '\n').take(90)}")
      }
    })
    names.foreach { n =>
      (1 to 2).foreach { i =>
        spark.catalog.clearCache()
        enabled = i == 2 // print only the steady-state run
        val t0 = System.nanoTime()
        val cnt = graft.SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
        println(f"[probe] $n run$i total ${(System.nanoTime() - t0) / 1e9}%7.2f s ($cnt rows)")
      }
      enabled = false
    }
    spark.stop()
  }
}
