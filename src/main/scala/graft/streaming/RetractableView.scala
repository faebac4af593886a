package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The STREAMING face of x154's retractable view maintenance: a CDC
  * change feed (each row a signed full image — +1 insert, −1 retract;
  * an update arrives as a retract/insert pair) folds into a stored
  * keyed aggregate snapshot per micro-batch via `foreachBatch`. The
  * fold is the z-set algebra: count ← Σsign, sum ← Σ(sign·x) — exact
  * over decimals, commutative, associative — so replaying a batch is
  * idempotent ONLY if the sink write is transactional per batch (the
  * K4 effectively-once contract); here the snapshot is rewritten
  * atomically per batch (materialize-then-overwrite).
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

  /** foreachBatch sink: read the stored snapshot, fold the micro-batch,
    * rewrite. The fold result is materialized (eager localCheckpoint)
    * BEFORE the overwrite — Spark cannot overwrite a path it is still
    * lazily reading from. */
  def sink(store: String, key: String)(batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    val empty = partials(batch.limit(0), key)
    val snapshot =
      try s.read.parquet(store)
      catch { case _: Throwable => empty }
    fold(snapshot, batch, key)
      .localCheckpoint(eager = true)
      .write.mode("overwrite").parquet(store)
  }
}
