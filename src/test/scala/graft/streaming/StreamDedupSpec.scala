package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamDedupSpec extends SparkSpecBase {
  import spark.implicits._

  test("dedupOnIngest drops corpus duplicates and within-stream duplicates, keeps new docs") {
    val corpus = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")

    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val stream = input.toDF().toDF("doc_id", "text", "ts")

    val out = StreamDedup.dedupOnIngest(stream, corpus)
    val q = out.writeStream.format("memory").queryName("ingested")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
      input.addData(
        (10L, "alpha beta", t0),     // exact dup of corpus doc 1 -> dropped
        (11L, "fresh doc one", t0),  // new -> kept
        (12L, "fresh doc one", t0),  // within-batch dup of 11 -> dropped
        (13L, "fresh doc two", t0))  // new -> kept
      q.processAllAvailable()
      // a later micro-batch inside the watermark: replay of 11's payload dropped
      input.addData((14L, "fresh doc one", Timestamp.valueOf("2024-01-01 00:01:00")))
      q.processAllAvailable()

      val kept = spark.table("ingested").select("doc_id").as[Long].collect().sorted
      assert(kept.toSeq === Seq(11L, 13L))
      // fingerprint column rides along and matches the batch plane's definition
      val fp = spark.table("ingested").filter($"doc_id" === 11L)
        .select("fp").as[String].head()
      val expected = Seq("fresh doc one").toDF("text")
        .select(graft.text.TextFunctions.fingerprint(col("text"))).as[String].head()
      assert(fp === expected)
    } finally q.stop()
  }
}
