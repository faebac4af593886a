package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of registered gate queries — the
  * per-operator plan audit (pushed filters, broadcast vs shuffle joins,
  * WholeStageCodegen spans, no surprise cartesians) without running
  * anything.
  *
  * Usage: runMain graft.tools.PlanDump <query>[,<query>...] [dir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(graft.SparkEntry.queries(n)(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
