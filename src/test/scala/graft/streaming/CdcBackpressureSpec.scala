package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import java.nio.file.{Files, Paths}

/** Kafka stand-in load test (no broker in this environment): the file
  * source plays the bounded-ingest role — `maxFilesPerTrigger` is the
  * same backpressure contract as Kafka's `maxOffsetsPerTrigger` (cap
  * work per micro-batch), and the checkpoint holds committed "offsets"
  * (processed files) so a restarted query resumes exactly after the
  * last completed batch instead of replaying the backlog.
  *
  * A `seq` field carried as [[CdcStream.SrcOffsetCol]] gives the LWW
  * dedup the same deterministic arrival-order tiebreak the Kafka path
  * gets from (partition, offset).
  */
class CdcBackpressureSpec extends SparkSpecBase {

  private val payloadSchema = StructType.fromDDL("id BIGINT, seq BIGINT, v STRING")

  /** Counts merge calls and rows — the backpressure/recovery probe. */
  private class CountingSink extends CdcStream.InMemorySink {
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val rows = new java.util.concurrent.atomic.AtomicLong(0L)
    override def merge(batch: org.apache.spark.sql.DataFrame, pkCol: String): Unit = {
      batches.incrementAndGet()
      rows.addAndGet(batch.count())
      super.merge(batch, pkCol)
    }
  }

  private def writeFile(dir: String, name: String, ids: Range, seqBase: Long): Unit = {
    val lines = ids.map(i =>
      s"""{"id": $i, "seq": ${seqBase + i}, "v": "s$seqBase"}""").mkString("\n")
    Files.write(Paths.get(dir, name), lines.getBytes("UTF-8"))
  }

  private def source(dir: String) =
    spark.readStream.option("maxFilesPerTrigger", 1).text(dir)
      .select(col("value").as("json"),
        lit(0).as(CdcStream.SrcPartitionCol),
        get_json_object(col("value"), "$.seq").cast("long").as(CdcStream.SrcOffsetCol))

  test("bounded triggers drain a backlog; restart resumes from the checkpoint") {
    val dir = Files.createTempDirectory("graft_bp_in").toString
    val ckpt = Files.createTempDirectory("graft_bp_ckpt").toString
    // backlog: 3 files × 500 rows, same 500 keys, seq strictly increasing
    // across files — the LWW winner for every key must come from file 3
    writeFile(dir, "f1.json", 0 until 500, 1000L)
    writeFile(dir, "f2.json", 0 until 500, 2000L)
    writeFile(dir, "f3.json", 0 until 500, 3000L)

    val sink1 = new CountingSink
    val q1 = CdcStream.run(source(dir), payloadSchema, "bp-topic", sink1, ckpt,
      availableNow = true).start()
    q1.awaitTermination()

    // maxFilesPerTrigger=1 bounded each micro-batch to one file
    assert(sink1.batches.get() >= 3, s"expected >=3 micro-batches, got ${sink1.batches.get()}")
    assert(sink1.rows.get() === 1500L)
    assert(sink1.state.size() === 500)
    // arrival-order LWW: every key carries the file-3 payload
    assert(sink1.state.get("7").getAs[Long]("seq") === 3007L)
    assert(sink1.state.get("499").getAs[String]("v") === "s3000")

    // two more files land while the stream is down…
    writeFile(dir, "f4.json", 0 until 500, 4000L)
    writeFile(dir, "f5.json", 0 until 250, 5000L)

    // …and a restarted query with the same checkpoint processes ONLY
    // them — committed offsets are not replayed
    val sink2 = new CountingSink
    val q2 = CdcStream.run(source(dir), payloadSchema, "bp-topic", sink2, ckpt,
      availableNow = true).start()
    q2.awaitTermination()

    assert(sink2.rows.get() === 750L, s"restart reprocessed: ${sink2.rows.get()} rows")
    assert(sink2.state.size() === 500)
    assert(sink2.state.get("0").getAs[Long]("seq") === 5000L)   // updated by f5
    assert(sink2.state.get("499").getAs[Long]("seq") === 4499L) // f5 stops at 249
  }
}
