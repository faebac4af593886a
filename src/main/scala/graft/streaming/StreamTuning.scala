package graft.streaming

import org.apache.spark.sql.SparkSession

/** Stream-side partition sizing (guide §2.2 "fewer, larger partitions",
  * §6 small files).
  *
  * A stateful streaming query freezes `spark.sql.shuffle.partitions`
  * into its checkpoint at start, and every micro-batch then pays a
  * FIXED per-partition cost regardless of rows: one state-store
  * open/commit (plus delta file) per partition per stateful operator,
  * one sink file per non-empty partition, one task launch per
  * partition per stage. Batch plans get this sizing for free from AQE
  * partition coalescing; streaming plans cannot use AQE, so the count
  * must be derived from the data, not inherited from the cluster
  * width. Measured on the gate rows (StreamProbe, idle host): a
  * ZERO-row finalize micro-batch cost ~2 s at 32 partitions — pure
  * per-partition machinery.
  *
  * [[withInputSizedShufflePartitions]] resolves the partition count
  * from the staged input volume at the standard ~64 MB advisory
  * (AQE's own default advisory size), clamped to [1, session value] —
  * so at production volumes (GBs+ per trigger) it resolves to the
  * session's full width and behaves exactly as before, while
  * gate/replay-sized inputs stop paying for near-empty state stores.
  * The session value is restored afterwards; the bench and verify
  * harnesses run queries sequentially, so the temporary override
  * cannot leak into another query's plan.
  */
object StreamTuning {

  /** AQE's default advisory partition size — the same "bytes one
    * shuffle partition should hold" judgment, applied to stream state
    * partitioning. */
  val AdvisoryBytesPerPartition: Long = 64L << 20

  private def dirBytes(path: String): Long = {
    val root = new java.io.File(path)
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
    walk(root)
  }

  /** Run `body` (stream start + awaitTermination) with
    * `spark.sql.shuffle.partitions` sized from the total bytes staged
    * under `inputDirs`; restore the session value afterwards. */
  def withInputSizedShufflePartitions[T](s: SparkSession,
                                         inputDirs: Seq[String])(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val before = s.conf.get(key)
    val bytes = inputDirs.map(dirBytes).sum
    val target = math.max(1L,
      math.min(before.toLong, bytes / AdvisoryBytesPerPartition + 1))
    s.conf.set(key, target.toString)
    try body finally s.conf.set(key, before)
  }
}
