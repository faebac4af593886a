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

  private def partitionFilters(df: org.apache.spark.sql.DataFrame) =
    // sparkPlan, not executedPlan: AQE's wrapper is a leaf to collect()
    // (the r11 vacuous-assertion lesson); the scan node's OWN
    // partitionFilters — the plan STRING always prints a
    // "PartitionFilters:" header even when the list is empty, so a
    // string-contains check here would be vacuous
    df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.flatMap(_.partitionFilters)

  test("static partition filter prunes to one directory") {
    val fact = spark.read.parquet(s"$factDir/fact")
    val one = fact.filter(col("load_year") === 1997)
    val pf = partitionFilters(one)
    assert(pf.exists(_.toString.contains("load_year")),
      s"load_year predicate must land in the scan's partitionFilters, got: $pf")
    // negative control: the matcher reports NOTHING on an unfiltered
    // scan — so the assertion above cannot pass vacuously
    assert(partitionFilters(fact).isEmpty,
      "unfiltered scan must carry no partition filters")
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
    def joined = fact.join(dim, fact("load_year") === dim("dim_year"))
    val pruned = partitionFilters(joined)
      .filter(_.toString.toLowerCase.contains("dynamicpruning"))
    assert(pruned.nonEmpty,
      s"expected a DynamicPruning partition filter on the fact scan, got: " +
        partitionFilters(joined).mkString(";"))
    // negative control: disabling the rule empties the matcher's result
    // on the IDENTICAL query — the positive assertion cannot pass
    // vacuously (e.g. by matching an unrelated string)
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
    try assert(partitionFilters(joined)
        .forall(!_.toString.toLowerCase.contains("dynamicpruning")),
      "with DPP disabled the fact scan must carry no DynamicPruning filter")
    finally spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    assert(joined.count() === Tables.orders(spark, sfDir)
      .filter(year(col("o_orderdate")) === 1997).count())
  }
}
