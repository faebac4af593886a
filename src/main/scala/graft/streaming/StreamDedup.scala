package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextFunctions.fingerprint

/** Dedup-on-ingest: the streaming face of the exact-dedup stack.
  *
  * A training corpus is not assembled once — it accretes. New documents
  * arrive as a stream and must be rejected if (a) the historical corpus
  * already contains the payload, or (b) an identical payload arrived
  * moments earlier in the same stream. Both checks key on the same
  * 128-bit content fingerprint as the batch plane
  * ([[graft.dedup.Dedup.exactDedup]]), so batch and streaming dedup
  * agree on what "duplicate" means.
  *
  * Scale shape:
  *   - the historical check is a stream-STATIC left-anti join on the
  *     fingerprint — each micro-batch shuffles only its own rows against
  *     the (bucketable) fingerprint table; the static side is planned
  *     once, and at 100 TB it is a pruned one-column parquet/Delta scan,
  *     not a broadcast.
  *   - the within-stream check is `dropDuplicatesWithinWatermark` on the
  *     fingerprint: state is bounded by the event-time watermark instead
  *     of growing with the corpus (the unbounded-state failure mode of
  *     plain dropDuplicates on an infinite stream).
  */
object StreamDedup {

  /** `stream` must carry `textCol` and an event-time `tsCol`; `corpus`
    * is the static historical table carrying `textCol`. Emits arriving
    * rows whose payload is new to both the corpus and the recent
    * stream, with the fingerprint attached as `fp`. */
  def dedupOnIngest(stream: DataFrame, corpus: DataFrame,
                    textCol: String = "text", tsCol: String = "ts",
                    watermark: String = "10 minutes"): DataFrame = {
    val hist = corpus.select(fingerprint(col(textCol)).as("fp")).distinct()
    stream.withColumn("fp", fingerprint(col(textCol)))
      .join(hist, Seq("fp"), "left_anti")
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
  }
}
