package graft.util

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-width guard for CPU-dense per-row pipelines (guide §6 input
  * split sizing, §2.5 input skew).
  *
  * Spark sizes scan tasks by BYTES (`spark.sql.files.maxPartitionBytes`,
  * row-group granularity), which is right when the downstream cost is
  * IO-shaped. Tokenize/shingle/hash pipelines are CPU-dense per input
  * byte — a table that fits one row group scans as ONE task and the
  * whole explode chain runs on one core while the rest of the cluster
  * idles (measured: x213's 3.2 s single-task shingle stage at local[32]).
  *
  * [[ensureParallelism]] widens such inputs to the cluster's default
  * parallelism with one deterministic hash repartition on the row key —
  * ONLY when the input is narrower than that (at production widths the
  * scan already carries more partitions than cores and this is the
  * identity: no exchange added). The key keeps the assignment
  * deterministic under retries (guide §2.5 — never round-robin a
  * nondeterministic source).
  */
object ScanTuning {
  def ensureParallelism(df: DataFrame, key: Column): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= want) df
    else df.repartition(want, key)
  }
}
