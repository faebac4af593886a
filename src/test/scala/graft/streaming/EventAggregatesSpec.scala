package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double)

class EventAggregatesSpec extends SparkSpecBase {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("tumbling window finalizes once the watermark passes its end") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventAggregates.tumblingCounts(input.toDF(), "1 hour", "0 seconds")
      .writeStream.format("memory").queryName("tumb").outputMode("append").start()
    try {
      input.addData(
        Ev(t("2024-01-01 00:10:00"), 1, "a", 1.0),
        Ev(t("2024-01-01 00:20:00"), 1, "a", 2.0))
      q.processAllAvailable()
      // advance event time past the window end, then let the watermark
      // commit propagate (it updates at end-of-batch)
      input.addData(Ev(t("2024-01-01 02:00:00"), 1, "b", 5.0))
      q.processAllAvailable()
      input.addData(Ev(t("2024-01-01 03:00:00"), 1, "b", 1.0))
      q.processAllAvailable()
      val rows = spark.table("tumb")
        .filter(col("event_type") === "a").collect()
      assert(rows.length === 1)
      assert(rows(0).getAs[Long]("n") === 2)
      assert(rows(0).getAs[Double]("total_value") === 3.0)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark suppresses replays across batches") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventAggregates.dedupWithinWatermark(
        input.toDF(), Seq("user_id", "event_type"), "1 hour")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      input.addData(Ev(t("2024-01-01 00:00:10"), 7, "click", 1.0))
      q.processAllAvailable()
      // same key replayed in a later batch, inside the watermark
      input.addData(Ev(t("2024-01-01 00:10:00"), 7, "click", 1.0))
      q.processAllAvailable()
      assert(spark.table("dedup").count() === 1)
    } finally q.stop()
  }

  test("mapGroupsWithState accumulates per-user totals across batches") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventAggregates.runningTotals(input.toDF())
      .writeStream.format("memory").queryName("rt").outputMode("update").start()
    try {
      input.addData(Ev(t("2024-01-01 00:00:00"), 1, "a", 2.0),
                    Ev(t("2024-01-01 00:01:00"), 1, "a", 3.0))
      q.processAllAvailable()
      input.addData(Ev(t("2024-01-01 00:02:00"), 1, "a", 5.0))
      q.processAllAvailable()
      val last = spark.table("rt").orderBy(desc("n_events")).first()
      assert(last.getAs[Long]("n_events") === 3)
      assert(last.getAs[Double]("total_value") === 10.0)
    } finally q.stop()
  }
}
