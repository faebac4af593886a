package graft.sources

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The partitioned warehouse layout (PipelineRunner writes facts
  * partitioned by load_year) must prune: static predicates skip
  * partitions at planning time, and a selective dim join prunes
  * dynamically (DPP) — at 100 TB this is the difference between reading
  * one year and reading the decade. */
class PartitionPruningSpec extends SparkSpecBase {

  private lazy val factDir: String = {
    val dir = Files.createTempDirectory("graft_pruning").toString
    Tables.orders(spark, sfDir)
      .withColumn("load_year", year(col("o_orderdate")))
      .write.partitionBy("load_year").parquet(s"$dir/fact")
    dir
  }

  test("static partition filter prunes to one directory") {
    val fact = spark.read.parquet(s"$factDir/fact")
    val one = fact.filter(col("load_year") === 1997)
    val scanned = one.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numFiles")).headOption
    one.count() // materialize metrics
    val plan = one.queryExecution.executedPlan.toString
    // partition filter visible in the scan, not a post-scan Filter
    assert(plan.contains("PartitionFilters") && plan.contains("load_year"))
    assert(one.count() === Tables.orders(spark, sfDir)
      .filter(year(col("o_orderdate")) === 1997).count())
  }

  test("selective dim join triggers dynamic partition pruning") {
    import spark.implicits._
    val fact = spark.read.parquet(s"$factDir/fact")
    // DPP requires a *selective predicate* on the build side, and the
    // predicate must survive as a Filter over a real scan (a literal
    // local relation constant-folds the filter away before the rule runs)
    Seq((1996, "other"), (1997, "focus"), (1998, "other2"))
      .toDF("dim_year", "tag").write.mode("overwrite").parquet(s"$factDir/dim")
    val dim = spark.read.parquet(s"$factDir/dim").filter(col("tag") === "focus")
    val joined = fact.join(dim, fact("load_year") === dim("dim_year"))
    val planText = joined.queryExecution.executedPlan.toString
    assert(planText.toLowerCase.contains("dynamicpruning"),
      s"expected a DPP subquery in:\n$planText")
    assert(joined.count() === Tables.orders(spark, sfDir)
      .filter(year(col("o_orderdate")) === 1997).count())
  }
}
