package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.{DataType, StructType}
import graft.cdc.{JsonFlatten, NameNormalizer, PkExtractor}

/** Structured-Streaming CDC plane — replaces the reference's single-threaded
  * kafka-python loop (`/root/reference/mongo_postgres_cdc.py:289-356,429-476`)
  * with a checkpointed micro-batch pipeline (SURVEY §2.7, §3.2):
  *
  *   kafka/file source → from_json → flatten → normalize names → extract pk
  *   → dedup within batch (last-write-wins) → foreachBatch(idempotent upsert)
  *
  * Checkpointed offsets + idempotent upsert ⇒ effectively-once (T2); the
  * reference is at-least-once with per-message transactions.
  */
object CdcStream {

  /** Pluggable per-batch sink. JDBC implementation issues
    * `JdbcSql.upsertSql`; tests use an in-memory map. */
  trait UpsertSink extends Serializable {
    def merge(batch: DataFrame, pkCol: String): Unit
  }

  /** Last-write-wins in-memory sink for tests and local smoke — the
    * idempotence contract is identical to the JDBC ON CONFLICT path. */
  class InMemorySink extends UpsertSink {
    val state = new java.util.concurrent.ConcurrentHashMap[String, Row]()
    override def merge(batch: DataFrame, pkCol: String): Unit =
      batch.collect().foreach(r => state.put(r.getAs[String](pkCol), r))
  }

  /** S4 (`mongo_postgres_cdc.py:382-401`): Kafka source with earliest reset.
    * maxOffsetsPerTrigger bounds batch size like the reference's
    * max_poll_records, but per-trigger across all partitions. */
  def kafkaSource(spark: SparkSession, bootstrap: String, topics: String,
                  maxPerTrigger: Long = 10000L): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topics)
      .option("startingOffsets", "earliest")
      .option("maxOffsetsPerTrigger", maxPerTrigger)
      .load()
      .select(col("topic"), col("value").cast("string").as("json"))

  /** P7 (`mongo_postgres_cdc.py:76-88`): substring topic→table routing. */
  def routeTable(topic: String): String = {
    val t = topic.toLowerCase
    if (t.contains("loan")) "loan_events"
    else if (t.contains("transaction") || t.contains("bank")) "transaction_events"
    else if (t.contains("customer")) "customer_events"
    else NameNormalizer.normalize(topic)
  }

  /** The batch-shape transform (pure, reused by tests and the stream):
    * json string + topic → flattened, normalized, keyed, metadata-stamped. */
  def transform(raw: DataFrame, payloadSchema: DataType, topic: String): DataFrame = {
    // the raw payload travels under an internal name so the reserved-name
    // policy (F20) can't rename the real metadata column
    val parsed = raw
      .withColumn("payload", from_json(col("json"), payloadSchema))
      .select(col("json").as("__graft_raw"), col("payload.*"))
    val flat = JsonFlatten.flatten(parsed)
    val normalized = NameNormalizer(flat)
    PkExtractor.withPrimaryKey(normalized)
      .withColumnRenamed("__graft_raw", "raw_data")
      .withColumn("kafka_topic", lit(topic))
      .withColumn("processed_at", current_timestamp())
  }

  /** F22/§7.1 (the reference's per-message inference, batch-granular):
    * infer the payload schema from the micro-batch's own JSON, flatten/
    * normalize/key as usual. Called inside `foreachBatch`, where the
    * schema may differ batch to batch; [[evolution]] computes the ALTER
    * columns against the sink's known schema. The reference crashed on
    * new fields (SURVEY §8.10) — here they become ADD COLUMNs. */
  def transformInferred(raw: DataFrame, topic: String): DataFrame = {
    val spark = raw.sparkSession
    import spark.implicits._
    val inferred = spark.read.json(raw.select(col("json")).as[String])
    val parsed = raw.withColumn("payload",
        from_json(col("json"), inferred.schema))
      .select(col("json").as("__graft_raw"), col("payload.*"))
    val flat = JsonFlatten.flatten(parsed)
    val normalized = NameNormalizer(flat)
    PkExtractor.withPrimaryKey(normalized)
      .withColumnRenamed("__graft_raw", "raw_data")
      .withColumn("kafka_topic", lit(topic))
      .withColumn("processed_at", current_timestamp())
  }

  /** Columns this batch carries that the sink table does not yet have —
    * the input to `JdbcSql.alterAddColumnsSql`. */
  def evolution(batch: DataFrame, knownColumns: Set[String]): Seq[org.apache.spark.sql.types.StructField] =
    batch.schema.fields.toSeq.filterNot(f => knownColumns.contains(f.name))

  /** Wire the full stream: dedup within watermark, then merge per batch.
    * `AvailableNow` drains a backlog and stops (catch-up mode, T1). */
  def run(source: DataFrame, payloadSchema: DataType, topic: String,
          sink: UpsertSink, checkpointDir: String,
          availableNow: Boolean = false): DataStreamWriter[Row] = {
    val shaped = transform(source, payloadSchema, topic)
    val writer = shaped.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // last-write-wins inside the batch, then idempotent merge (D2/T2)
        val pk = "kafka_primary_key"
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(pk).orderBy(monotonically_increasing_id().desc)
        val deduped = batch.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        sink.merge(deduped, pk)
      }
    if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer
  }
}
