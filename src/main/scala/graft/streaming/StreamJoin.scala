package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins (SURVEY §2.7 extension): event-time interval
  * joins between two live streams — the attribution / enrichment shape
  * (`clicks ⋈ impressions`) the CDC plane's stream-STATIC joins can't
  * express when both sides move.
  *
  * Scale contract: an unbounded stream-stream join can never GC either
  * side's state. What bounds it here is the pair of watermarks PLUS the
  * event-time interval in the join condition — Spark derives per-side
  * state retention (window + watermark) from them and evicts expired
  * rows, so state is proportional to traffic in the interval, never to
  * stream history.
  */
object StreamJoin {

  /** Attribute each click to every impression by the same user at most
    * `window` earlier. Batch/stream agnostic (the module contract): on
    * streams both sides carry watermarks and emit as soon as both rows
    * have arrived (inner join, append mode); on batch frames the
    * watermark is a no-op and the identical plan is a per-user range
    * join — which is how the oracle checks it (`t4_interval_join`).
    *
    * Expects `(imp_ts, imp_user)` on the left and `(click_ts,
    * click_user)` on the right — rename at the call site; keeping the
    * sides' columns disjoint is what makes the time-bound condition
    * unambiguous. */
  def attributedClicks(impressions: DataFrame, clicks: DataFrame,
                       window: String = "1 hour",
                       watermark: String = "2 hours"): DataFrame = {
    val imp = impressions.withWatermark("imp_ts", watermark)
    val clk = clicks.withWatermark("click_ts", watermark)
    imp.join(clk, expr(
      s"""imp_user = click_user AND
          click_ts >= imp_ts AND
          click_ts <= imp_ts + INTERVAL $window"""))
  }
}
