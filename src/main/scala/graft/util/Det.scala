package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic-aggregation helpers.
  *
  * Double addition is not associative, so `sum(double)` depends on
  * partition/merge order and will not hash-match a single-threaded
  * DuckDB oracle (or even a re-run of the same cluster job). Every
  * money/measure aggregate therefore sums an exact DECIMAL and only
  * converts to DOUBLE at the very end — the decimal sum is
  * order-independent and the final decimal→double conversion is
  * correctly rounded (identical bits) on every engine.
  *
  * This is also the right call at 100 TB: partial aggregation order
  * across 1000 executors is arbitrary, and exact decimal keeps results
  * reproducible run-to-run.
  */
object Det {

  /** Exact, order-independent sum of a double measure.
    * Oracle form: CAST(SUM(CAST(x AS DECIMAL(18,s)) ) AS DOUBLE) */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** Deterministic mean: exact decimal sum, one double division.
    * Oracle form: CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / COUNT(x) */
  def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double") / count(c)

  /** Round a per-row double expression to `scale` before exact-summing —
    * for derived measures like price*(1-discount) whose per-row double
    * value is deterministic but whose running double sum is not. */
  def dsumExpr(c: Column, scale: Int = 6): Column =
    sum(c.cast(s"decimal(28,$scale)")).cast("double")
}
