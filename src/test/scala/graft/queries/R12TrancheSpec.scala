package graft.queries

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Behavior pins for the round-12 tranche (X206-X210). Value
  * correctness is the oracle hash gate's job; these pin the invariants
  * the gates don't state directly: dictionary density/order/stability,
  * merge-audit accounting, and packing-leakage coverage. */
class R12TrancheSpec extends SparkSpecBase {

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sfDir)

  test("x183: dictionary ids are dense 1..K and order-preserving; every order encodes") {
    val rows = run("x183_dict_encode").collect()
    val k = Tables.orders(spark, sfDir)
      .select(col("o_orderdate").cast("date")).distinct().count()
    // density: bucket id ranges tile [1, K] with no gaps or overlaps
    val spans = rows.map(r => (r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(spans.head._1 == 1L && spans.last._2 == k)
    spans.zip(spans.tail).foreach { case ((_, hi), (lo2, _)) =>
      assert(lo2 == hi + 1, s"id gap/overlap between buckets: $hi -> $lo2") }
    // order preservation: date ranges ascend with the id buckets
    val dates = rows.sortBy(_.getLong(2)).map(r => (r.getString(4), r.getString(5)))
    dates.zip(dates.tail).foreach { case ((_, hiD), (loD2, _)) =>
      assert(loD2 > hiD, s"date ranges must ascend with ids: $hiD !< $loD2") }
    assert(rows.map(_.getLong(6)).sum == Tables.orders(spark, sfDir).count(),
      "every fact row must encode exactly once")
  }

  test("x184: epoch-0 ids occupy exactly [1,K0], epoch-1 exactly [K0+1,K]; old ids stable") {
    val rows = run("x184_dict_evolve").collect().sortBy(_.getInt(0))
    assert(rows.length == 2)
    val (e0, e1) = (rows(0), rows(1))
    assert(e0.getLong(2) == 1L, "epoch-0 ids start at 1")
    assert(e1.getLong(2) == e0.getLong(3) + 1,
      "epoch-1 ids start exactly past the epoch-0 ceiling — append-only")
    assert(e0.getLong(1) == e0.getLong(3) && e1.getLong(1) == e1.getLong(3) - e0.getLong(3),
      "each epoch's interval is dense (n_values == interval width)")
    // stability: the epoch-0 assignment is the same rank x183 would
    // give restricted to pre-cutoff values (both rank by value), so
    // adding the new values changed NO old id — observable as the
    // epoch-0 interval being independent of epoch 1's existence
    val k0 = Tables.orders(spark, sfDir)
      .select(col("o_orderdate").cast("date").as("v")).distinct()
      .filter(col("v") < to_date(lit("1997-06-01"))).count()
    assert(e0.getLong(3) == k0)
  }

  test("x185: fan-out accounting matches the source construction") {
    val o = Tables.orders(spark, sfDir)
    val k = col("o_orderkey")
    val upd = o.filter(pmod(k, lit(5L)) === 1)
    val nAll = upd.count()
    val n7 = upd.filter(pmod(k, lit(7L)) === 0).count()
    val n11 = upd.filter(pmod(k, lit(11L)) === 0).count()
    val n77 = upd.filter(pmod(k, lit(7L)) === 0 && pmod(k, lit(11L)) === 0).count()
    val rows = run("x185_merge_cardinality").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rows.getOrElse((1L, "clean"), 0L) == nAll - n7 - n11 + n77)
    assert(rows.getOrElse((2L, "update+update"), 0L) == n7 - n77)
    assert(rows.getOrElse((2L, "update+delete"), 0L) == n11 - n77)
    assert(rows.getOrElse((3L, "update+delete"), 0L) == n77)
    assert(rows.values.sum == nAll, "every source key classified exactly once")
  }

  test("x186: session count is monotone nonincreasing in the gap; event totals constant") {
    val rows = run("x186_session_gaps").collect() // gap-ordered
    val nEvents = Tables.events(spark, sfDir).count()
    rows.foreach(r => assert(r.getLong(2) == nEvents,
      "every candidate gap classifies ALL events"))
    val sess = rows.map(_.getLong(1))
    sess.zip(sess.tail).foreach { case (a, b) =>
      assert(b <= a, "a larger gap can only merge sessions, never split them") }
    rows.foreach(r => assert(r.getLong(1) >= 1 && r.getLong(1) <= nEvents))
  }

  test("x187: the per-date-product exact size equals a REAL join count") {
    val rows = run("x187_joinsize_est").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val month = rows.keys.toSeq.sorted.apply(rows.size / 2)
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderdate").cast("date").as("dt"))
      .filter(date_format(col("dt"), "yyyy-MM") === month)
    val l = Tables.lineitem(spark, sfDir)
      .select(col("l_shipdate").cast("date").as("dt"))
      .filter(date_format(col("dt"), "yyyy-MM") === month)
    assert(o.join(l, Seq("dt")).count() == rows(month),
      s"per-date-product trick must equal the materialized join for $month")
  }

  test("x189: greedy view selection picks the full grouping first; benefits nonincrease") {
    val rows = run("x189_view_selection").collect() // round-ordered
    assert(rows.length == 3)
    // with |fact| >> every lattice cardinality, the finest grouping
    // (node 7) benefits all 8 lattice nodes and must win round 1
    assert(rows(0).getInt(1) == 7, "round 1 must select the finest grouping")
    val benefits = rows.map(_.getLong(3))
    benefits.zip(benefits.tail).foreach { case (a, b) =>
      assert(b <= a, "greedy benefit is nonincreasing (submodular objective)") }
    assert(rows.map(_.getInt(1)).distinct.length == 3, "no view selected twice")
  }

  test("x190: the stream-executed tumbling plan equals the batch t2 answer") {
    val streamed = run("x190_stream_tumbling").collect().map(_.toString)
    val batch = Cdc.queries("t2_tumbling_window")(spark, sfDir).collect()
      .map(_.toString)
    assert(streamed.toSeq == batch.toSeq,
      "one plan, two execution modes, one answer")
  }

  test("x191: the stream-executed session plan equals the batch t3 answer") {
    val streamed = run("x191_stream_sessions").collect().map(_.toString)
    val batch = Cdc.queries("t3_session_window")(spark, sfDir).collect()
      .map(_.toString)
    assert(streamed.toSeq == batch.toSeq,
      "cross-batch session merges must converge to the batch sessionization")
  }

  test("x182: bin kinds cover every doc; mixed bins really mix splits") {
    val rows = run("x182_pack_leakage").collect()
    assert(rows.map(_.getLong(2)).sum ==
      Tables.documents(spark, sfDir).count(),
      "every document sits in exactly one classified bin")
    val kinds = rows.map(_.getString(0)).toSet
    assert(kinds.subsetOf(Set("mixed", "pure_train", "pure_val", "pure_test")))
    // at-risk counts only ever come from mixed bins
    rows.filter(_.getString(0) != "mixed")
      .foreach(r => assert(r.getLong(3) == 0L,
        "pure bins must report zero eval docs at risk"))
  }
}
