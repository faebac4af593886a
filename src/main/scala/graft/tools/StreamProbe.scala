package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Diagnostic harness for the streaming gate rows: runs a registered
  * query once with a [[StreamingQueryListener]] attached and prints each
  * micro-batch's durationMs breakdown (addBatch / getBatch /
  * queryPlanning / walCommit / commitOffsets / stateOperators), plus
  * coarse wall-clock marks around the registry call — the measurement
  * loop of guide §1 applied to the streaming lifecycles, where the SQL
  * tab is unavailable (UI disabled) and the cost splits across staging
  * writes, micro-batches and the read-back. */
object StreamProbe {
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
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(f"[probe] query started ${e.id}")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs}")
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"[probe] query terminated")
    })
    names.foreach { n =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val t1 = System.nanoTime()
        val cnt = df.queryExecution.toRdd.count()
        val t2 = System.nanoTime()
        println(f"[probe] $n run$i build ${(t1 - t0) / 1e9}%6.2f s  " +
          f"collect ${(t2 - t1) / 1e9}%6.2f s  ($cnt rows)")
      }
    }
    spark.stop()
  }
}
