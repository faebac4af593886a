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

  test("flatMapGroupsWithState emits a session ONCE, on watermark timeout, then evicts state") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventAggregates.closedSessions(input.toDF(),
        gapMs = 600000L /* 10 min */, watermark = "0 seconds")
      .writeStream.format("memory").queryName("cs").outputMode("append").start()
    try {
      input.addData(
        Ev(t("2024-01-01 00:00:00"), 1, "a", 1.0),
        Ev(t("2024-01-01 00:05:00"), 1, "a", 2.0))
      q.processAllAvailable()
      // session still open: nothing emitted yet
      assert(spark.table("cs").count() === 0)
      // another user's event advances the watermark past last+gap;
      // the timeout fires on the NEXT batch after the commit propagates
      input.addData(Ev(t("2024-01-01 01:00:00"), 2, "b", 0.0))
      q.processAllAvailable()
      input.addData(Ev(t("2024-01-01 02:00:00"), 2, "b", 0.0))
      q.processAllAvailable()
      val rows = spark.table("cs").filter(col("user_id") === 1).collect()
      assert(rows.length === 1)
      assert(rows(0).getAs[Timestamp]("session_start") === t("2024-01-01 00:00:00"))
      assert(rows(0).getAs[Timestamp]("session_end") === t("2024-01-01 00:15:00"))
      assert(rows(0).getAs[Long]("n_events") === 2)
      assert(rows(0).getAs[Double]("total_value") === 3.0)
    } finally q.stop()
  }

  test("an event at EXACTLY last+gap starts a new session (session_window parity: ranges are [start, last+gap))") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventAggregates.closedSessions(input.toDF(),
        gapMs = 600000L, watermark = "0 seconds")
      .writeStream.format("memory").queryName("csb").outputMode("append").start()
    try {
      // second event exactly 10 min after the first: the batch oracle
      // (lag diff >= gap ⇒ new session) puts it in a NEW session, so the
      // keyed-state face must close the first one immediately
      input.addData(
        Ev(t("2024-01-01 00:00:00"), 9, "a", 1.0),
        Ev(t("2024-01-01 00:10:00"), 9, "a", 2.0))
      q.processAllAvailable()
      val rows = spark.table("csb").collect()
      assert(rows.length === 1)
      assert(rows(0).getAs[Timestamp]("session_start") === t("2024-01-01 00:00:00"))
      assert(rows(0).getAs[Timestamp]("session_end") === t("2024-01-01 00:10:00"))
      assert(rows(0).getAs[Long]("n_events") === 1)
    } finally q.stop()
  }

  test("session totals accumulate as exact cents, not drifting doubles") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventAggregates.closedSessions(input.toDF(),
        gapMs = 600000L, watermark = "0 seconds")
      .writeStream.format("memory").queryName("csc").outputMode("append").start()
    try {
      // 0.1 + 0.2 in double order-of-arrival is 0.30000000000000004; the
      // decimal-summing batch oracle says exactly 0.3 — so must we
      input.addData(
        Ev(t("2024-01-01 00:00:00"), 11, "a", 0.1),
        Ev(t("2024-01-01 00:01:00"), 11, "a", 0.2),
        Ev(t("2024-01-01 01:00:00"), 11, "a", 9.0))
      q.processAllAvailable()
      val rows = spark.table("csc").collect()
      assert(rows.length === 1)
      assert(rows(0).getAs[Double]("total_value") === 0.3)
    } finally q.stop()
  }

  test("an intra-batch gap closes the earlier session immediately") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventAggregates.closedSessions(input.toDF(),
        gapMs = 600000L, watermark = "0 seconds")
      .writeStream.format("memory").queryName("cs2").outputMode("append").start()
    try {
      // two clusters 50 min apart in ONE batch: the first closes now,
      // the second stays open in state
      input.addData(
        Ev(t("2024-01-01 00:00:00"), 5, "a", 1.0),
        Ev(t("2024-01-01 00:04:00"), 5, "a", 1.0),
        Ev(t("2024-01-01 01:00:00"), 5, "a", 7.0))
      q.processAllAvailable()
      val rows = spark.table("cs2").collect()
      assert(rows.length === 1)
      assert(rows(0).getAs[Long]("n_events") === 2)
      assert(rows(0).getAs[Timestamp]("session_end") === t("2024-01-01 00:14:00"))
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
