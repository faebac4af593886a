package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

case class Imp(imp_ts: Timestamp, imp_user: Long, imp_id: Long)
case class Clk(click_ts: Timestamp, click_user: Long, click_id: Long)

class StreamJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("stream-stream interval join emits in-window pairs only") {
    implicit val sq = spark.sqlContext
    val imps = MemoryStream[Imp]
    val clks = MemoryStream[Clk]
    val q = StreamJoin.attributedClicks(imps.toDF(), clks.toDF(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("attr").outputMode("append").start()
    try {
      imps.addData(
        Imp(t("2024-01-01 10:00:00"), 1, 100),
        Imp(t("2024-01-01 10:00:00"), 2, 200))
      clks.addData(
        Clk(t("2024-01-01 10:30:00"), 1, 1000), // 30 min after user 1's impression
        Clk(t("2024-01-01 12:30:00"), 2, 2000)) // 2.5 h after user 2's — outside window
      q.processAllAvailable()
      val rows = spark.table("attr").collect()
      assert(rows.map(_.getAs[Long]("click_id")).toSet === Set(1000L))
      assert(rows.head.getAs[Long]("imp_id") === 100L)
    } finally q.stop()
  }

  test("a pair emits once both sides have arrived, across micro-batches") {
    implicit val sq = spark.sqlContext
    val imps = MemoryStream[Imp]
    val clks = MemoryStream[Clk]
    val q = StreamJoin.attributedClicks(imps.toDF(), clks.toDF(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("attr2").outputMode("append").start()
    try {
      imps.addData(Imp(t("2024-01-01 10:00:00"), 7, 700))
      q.processAllAvailable()
      assert(spark.table("attr2").count() === 0) // click not seen yet
      clks.addData(Clk(t("2024-01-01 10:20:00"), 7, 7000))
      q.processAllAvailable()
      val rows = spark.table("attr2").collect()
      assert(rows.length === 1)
      assert(rows.head.getAs[Long]("imp_id") === 700L)
      assert(rows.head.getAs[Long]("click_id") === 7000L)
    } finally q.stop()
  }

  test("late clicks beyond the watermark never match an evicted impression") {
    implicit val sq = spark.sqlContext
    val imps = MemoryStream[Imp]
    val clks = MemoryStream[Clk]
    val q = StreamJoin.attributedClicks(imps.toDF(), clks.toDF(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("attr3").outputMode("append").start()
    try {
      imps.addData(Imp(t("2024-01-01 10:00:00"), 3, 300))
      clks.addData(Clk(t("2024-01-01 10:00:00"), 99, 9900)) // advances click-side time
      q.processAllAvailable()
      // advance BOTH event-time watermarks far past the impression's
      // retention bound (10:00 + 1 h window + 2 h watermark)
      imps.addData(Imp(t("2024-01-02 12:00:00"), 98, 9800))
      clks.addData(Clk(t("2024-01-02 12:00:00"), 97, 9700))
      q.processAllAvailable()
      imps.addData(Imp(t("2024-01-02 12:00:01"), 96, 9600))
      clks.addData(Clk(t("2024-01-02 12:00:01"), 95, 9500))
      q.processAllAvailable()
      val before = spark.table("attr3").count()
      // a click that WOULD match impression 300 in event time, arriving
      // far behind the watermark: state for the impression is gone and
      // the late row is dropped — no pair appears
      clks.addData(Clk(t("2024-01-01 10:30:00"), 3, 3000))
      q.processAllAvailable()
      assert(spark.table("attr3").count() === before)
    } finally q.stop()
  }
}
