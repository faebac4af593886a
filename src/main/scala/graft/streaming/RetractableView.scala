package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The STREAMING face of x154's retractable view maintenance: a CDC
  * change feed (each row a signed full image — +1 insert, −1 retract;
  * an update arrives as a retract/insert pair) folds into a stored
  * keyed aggregate snapshot per micro-batch via `foreachBatch`. The
  * fold is the z-set algebra: count ← Σsign, sum ← Σ(sign·x) — exact
  * over decimals, commutative, associative — and replay-safe: the
  * last applied batchId rides INSIDE each snapshot (`_batch` marker,
  * swapped atomically with the data), so the crash-replay of an
  * already-folded batch is a detected no-op rather than a double
  * application (the K4 effectively-once contract); the snapshot swap is
  * crash-safe: the new snapshot is fully written to a side path and
  * then swapped in with two renames (store→old, new→store), so at
  * every instant either `store` or `store.old` holds a COMPLETE
  * snapshot — a crash mid-swap is healed by `resolve` on the next
  * batch (rename old→store), never read as empty.
  *
  * At 100 TB the snapshot is KEYS-sized and each fold touches one
  * batch + the snapshot — the base history is never rescanned, which
  * is the entire point of maintaining the view instead of recomputing
  * it (`Airflow.py:22`'s truncate-and-reload cadence is the cost this
  * replaces).
  */
object RetractableView {

  /** Signed partials of a change batch: (key, n = Σsign, total =
    * Σ(sign·value)). `batch` needs columns (key, value, sign). */
  def partials(batch: DataFrame, key: String): DataFrame =
    batch.groupBy(key)
      .agg(sum(col("sign")).as("n"),
        sum((col("value").cast("decimal(18,2)") * col("sign"))
          .cast("decimal(28,2)")).as("total"))

  /** Fold a signed batch into the stored snapshot — groups whose count
    * folds to zero leave the view (a fully-retracted key must not
    * linger as a 0-count row). */
  def fold(snapshot: DataFrame, batch: DataFrame, key: String): DataFrame =
    snapshot.unionByName(partials(batch, key))
      .groupBy(key)
      .agg(sum("n").as("n"), sum("total").as("total"))
      .filter(col("n") =!= 0)

  private def fs(s: org.apache.spark.sql.SparkSession,
                 p: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.FileSystem =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Heal a crash mid-swap and report whether a snapshot exists. If the
    * current path is missing but the `.old` side survives (the crash
    * window between the two renames in [[sink]]), rename it back —
    * only a genuinely never-written store reads as empty. Any OTHER
    * read failure (transient IO, corrupt file) must propagate: the
    * pre-r11 blanket catch silently reset the view to zero. */
  def resolve(s: org.apache.spark.sql.SparkSession, store: String): Boolean = {
    val cur = new org.apache.hadoop.fs.Path(store)
    val old = new org.apache.hadoop.fs.Path(store + ".old")
    val f = fs(s, cur)
    if (!f.exists(cur) && f.exists(old) && !f.rename(old, cur))
      // a failed heal rename must PROPAGATE, not fall through to
      // "no snapshot" — returning false here would let sink silently
      // reinitialize the view to empty, the exact zeroing failure
      // mode the two-rename swap exists to eliminate
      throw new java.io.IOException(s"heal rename $old -> $cur failed")
    f.exists(cur)
  }

  /** The snapshot's replay marker: `_batch` INSIDE the snapshot
    * directory (underscore-prefixed, so parquet reads ignore it),
    * holding the last applied batchId. Written into the FRESH snapshot
    * before the swap, so the marker travels atomically with the data:
    * after a crash the surviving snapshot always carries the id of the
    * last batch folded into it. Absent (a pre-marker store, or a
    * never-written view) reads as -1 = "apply anything". */
  private def markerPath(store: String) =
    new org.apache.hadoop.fs.Path(store, "_batch")

  def lastApplied(s: org.apache.spark.sql.SparkSession, store: String): Long = {
    val p = markerPath(store)
    val f = fs(s, p)
    if (!f.exists(p)) -1L
    else {
      val in = f.open(p)
      try new String(in.readAllBytes(), "UTF-8").trim.toLong
      finally in.close()
    }
  }

  /** foreachBatch sink: read the stored snapshot, fold the micro-batch,
    * swap the result in crash-safely. The new snapshot is written
    * COMPLETELY to `store.new` (materialized via eager localCheckpoint
    * first — Spark cannot write a path it is still lazily reading
    * from), then swapped with two directory renames; [[resolve]] heals
    * the one-rename crash window on the next batch. Missing-path is
    * the ONLY condition treated as an empty snapshot — IO errors
    * rethrow instead of zeroing the view. */
  def sink(store: String, key: String)(batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    val exists = resolve(s, store)
    // replay guard: foreachBatch redelivers the last batch when a crash
    // lands between the snapshot swap and the streaming checkpoint
    // commit; re-folding an already-applied signed batch double-counts
    // it. The marker rode the swap, so "applied" is exactly "visible in
    // the surviving snapshot" — an already-applied id is a no-op.
    if (exists && batchId <= lastApplied(s, store)) return
    val snapshot =
      if (exists) s.read.parquet(store)
      else partials(batch.limit(0), key)
    val cur = new org.apache.hadoop.fs.Path(store)
    val old = new org.apache.hadoop.fs.Path(store + ".old")
    val fresh = new org.apache.hadoop.fs.Path(store + ".new")
    val f = fs(s, cur)
    fold(snapshot, batch, key)
      .localCheckpoint(eager = true)
      .write.mode("overwrite").parquet(fresh.toString)
    val out = f.create(new org.apache.hadoop.fs.Path(fresh, "_batch"), true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    f.delete(old, true)
    if (f.exists(cur) && !f.rename(cur, old))
      throw new java.io.IOException(s"rename $cur -> $old failed")
    if (!f.rename(fresh, cur))
      throw new java.io.IOException(s"rename $fresh -> $cur failed")
    f.delete(old, true)
  }
}
