package graft.dims

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Late-arriving dimension handling (SURVEY §2.7a X154).
  *
  * The reference's dim loads (`DB.sql:85-101` INSERT…SELECT) assume
  * every fact FK already has its dimension row; in a live warehouse
  * facts routinely land BEFORE their dimension feed (a sale for a part
  * created this morning). The standard Kimball remedy, in two
  * idempotent steps:
  *
  *   1. [[inferMembers]] — surrogate "inferred members": one placeholder
  *      dim row per fact key missing from the snapshot, so fact loads
  *      never drop rows or break FK joins;
  *   2. [[backfill]] — when the real dimension rows arrive, an SCD1
  *      overwrite replaces the placeholders (and inserts any still-new
  *      keys) by key.
  *
  * Scale shape: step 1 is one shuffle on the fact key of a
  * key-projected scan (map-side-combined distinct) anti-joined against
  * the dim — the result is dimension-sized, never fact-sized. Step 2
  * never touches facts at all: anti-join + union of two
  * dimension-sized inputs. Both are the same plan at 100 TB with the
  * dim side broadcast when small.
  */
object LateDim {

  /** Placeholder rows for fact keys absent from `dim`: `dimKey` takes
    * the fact key's value, every other dim column takes its
    * `placeholders` literal. */
  def inferMembers(facts: DataFrame, dim: DataFrame, factKey: String,
                   dimKey: String, placeholders: Seq[(String, Column)]): DataFrame = {
    val missing = facts.select(col(factKey).as(dimKey)).distinct()
      .join(dim, Seq(dimKey), "left_anti")
    missing.select(col(dimKey) +: placeholders.map { case (n, c) => c.as(n) }: _*)
  }

  /** SCD1 overwrite-by-key: rows of `updates` replace same-key rows of
    * `dim`; novel keys insert. Column sets must match. */
  def backfill(dim: DataFrame, updates: DataFrame, key: String): DataFrame =
    dim.join(updates, Seq(key), "left_anti")
      .unionByName(updates.select(dim.columns.map(col): _*))
}
