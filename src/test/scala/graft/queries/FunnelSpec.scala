package graft.queries

import graft.SparkSpecBase
import java.sql.Timestamp

/** a21_event_funnel ordering semantics on a hand-built fixture — the
  * DuckDB oracle mirrors the same window logic, so only an independent
  * hand-computed corpus pins the ORDERED-stage rule: a stage counts
  * only when some earlier-stage row precedes it in event time.
  */
class FunnelSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("funnel counts a stage only when an earlier-stage event precedes it") {
    // (event_id, ts, user_id, event_type)
    val rows = Seq(
      // user 1: the full ordered path
      (1L, ts(1), 1L, "view"), (2L, ts(2), 1L, "click"), (3L, ts(3), 1L, "purchase"),
      // user 2: click BEFORE view — click must not count; purchase after
      // the (uncounted) click must not count either
      (4L, ts(1), 2L, "click"), (5L, ts(2), 2L, "view"), (6L, ts(3), 2L, "purchase"),
      // user 3: purchase with no click at all
      (7L, ts(1), 3L, "view"), (8L, ts(2), 3L, "purchase"),
      // user 4: fully reversed
      (9L, ts(1), 4L, "purchase"), (10L, ts(2), 4L, "click"), (11L, ts(3), 4L, "view"),
      // user 5: view then click, no purchase
      (12L, ts(1), 5L, "view"), (13L, ts(2), 5L, "click"))
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel").toString
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = Relational.queries("a21_event_funnel")(spark, dir)
      .as[(Long, Long, Long)].head()
    assert(got === ((5L, 2L, 1L)),
      "view=all 5 users; click-after-view=users 1,5; purchase-after-click=user 1")
  }
}
