package graft.dims

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Slowly-changing-dimension Type 2 builder: turn a change log into
  * versioned dimension rows with validity intervals.
  *
  * The reference's dims are overwrite-only (no history); SCD2 is the
  * standard warehouse answer when "what was the customer's status when
  * the loan was booked" must stay answerable (SURVEY §2.6 W1 note —
  * this is why the engine ships ranking windows). One window pass per
  * key: `effective_from` = the change timestamp, `effective_to` = the
  * next change (open-ended for the current row), dense `version`.
  */
object Scd2 {

  /** `tiebreak` orders simultaneous changes deterministically (e.g. the
    * event/CDC sequence id). */
  def fromChangeLog(changes: DataFrame, key: String, ts: String, tiebreak: String,
                    attrs: Seq[String]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tiebreak)
    changes.select(
      (col(key) +: attrs.map(col)) ++ Seq(
        col(ts).as("effective_from"),
        lead(col(ts), 1).over(w).as("effective_to"),
        lead(col(ts), 1).over(w).isNull.cast("int").as("is_current"),
        row_number().over(w).as("version")): _*)
  }
}
