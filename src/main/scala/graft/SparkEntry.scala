package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every module's query registry. Each key has a matching
  * DuckDB oracle in [[oracleSql]] unless the operator is not
  * SQL-expressible (then the driver records a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The 3-table star join + rollup (`DB.sql:109-124` intent). */
  def entry(spark: SparkSession): DataFrame =
    queries("j2_star3_rollup")(spark, "/root/testdata/sf0.001")

  private def registries: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (graft.queries.Relational.queries, graft.queries.Relational.oracles),
      (graft.queries.Cdc.queries, graft.queries.Cdc.oracles),
      (graft.queries.Quality.queries, graft.queries.Quality.oracles),
      (graft.queries.TrainingData.queries, graft.queries.TrainingData.oracles),
      (graft.queries.Warehouse.queries, graft.queries.Warehouse.oracles))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registries.map(_._2).reduce(_ ++ _)
}
