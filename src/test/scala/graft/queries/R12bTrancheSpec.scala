package graft.queries

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Behavior pins for the second round-12 tranche (X217-X222). Value
  * correctness is the oracle hash gate's job; these pin the invariants
  * the gates don't state directly: the stream-stream join's cross-batch
  * state survival, FIFO conservation, island maximality, the rolling
  * window's naive-form equivalence, and exact-budget apportionment. */
class R12bTrancheSpec extends SparkSpecBase {

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sfDir)

  test("x192: stream-executed join equals batch t4; boundary pairs cross micro-batches") {
    val streamed = run("x192_stream_join").collect().map(_.toSeq)
    val batch = run("t4_interval_join").collect().map(_.toSeq)
    assert(streamed.toSeq == batch.toSeq,
      "stream-stream join must converge to the batch interval join")
    // the ssjMid file split means at least one attributed pair must
    // have its impression in batch 0 and its click in batch 1 — the
    // pair only exists if join state survived the batch boundary
    val ev = Tables.events(spark, sfDir).withColumn("ts", col("ts").cast("timestamp"))
    val imp = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("imp_id"), col("user_id").as("imp_user"),
        col("ts").as("imp_ts"))
    val clk = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
    val mid = Cdc.ssjMid(imp, clk)
    val crossBatch = run("t4_interval_join")
      .join(imp.select("imp_id", "imp_ts"), Seq("imp_id"))
      .join(clk.select("click_id", "click_ts"), Seq("click_id"))
      .filter(col("imp_ts") < lit(mid) && col("click_ts") >= lit(mid))
      .count()
    assert(crossBatch > 0,
      "split produced no boundary pairs — the gate would not exercise cross-batch join state")
  }

  test("x193: FIFO conservation — matched ≡ min(received, issued) per part, cost only from receipts") {
    val rows = run("x193_fifo_costing").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (recv, iss, m, cost) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(m == math.min(recv, iss),
        s"part ${r.getLong(0)}: FIFO must consume exactly min(received, issued)")
      assert(m > 0 || cost == 0, "no matches → no cost")
    }
  }

  test("x194: every island is strictly increasing and maximal against the order history") {
    val runs = run("x194_streak_islands").collect()
    assert(runs.nonEmpty)
    assert(runs.forall(_.getLong(4) >= 3), "only 3+ streaks are reported")
    // replay a sample of customers' full order sequences locally and
    // recompute their maximal strict runs — must match the gate exactly
    val sample = runs.map(_.getLong(0)).distinct.sorted.take(20).toSet
    val hist = Tables.orders(spark, sfDir)
      .filter(col("o_custkey").isin(sample.toSeq: _*))
      .select(col("o_custkey"), col("o_orderdate").cast("date").cast("string"),
        col("o_orderkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).map { case (c, rs) => c -> rs.map(_._2).sortBy(t => (t._1, t._2)) }
    val expected = hist.flatMap { case (c, seq) =>
      // split into maximal strictly-increasing runs
      val runsLocal = seq.foldLeft(List.empty[List[(String, Long, Long)]]) {
        case (acc, e) => acc match {
          case cur :: rest if cur.head._3 < e._3 => (e :: cur) :: rest
          case _ => List(e) :: acc
        }
      }.map(_.reverse).reverse
      runsLocal.filter(_.size >= 3).map(r =>
        (c, r.map(_._2).min, r.size.toLong, r.map(_._3).sum))
    }.toSet
    val got = runs.filter(r => sample(r.getLong(0)))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getLong(5))).toSet
    assert(got == expected, "gate islands must equal the locally replayed maximal runs")
  }

  test("x195: presence-explode equals the naive per-day range self-join; u7 ≥ u1") {
    val got = run("x195_rolling_distinct").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(got.forall { case (_, u1, u7) => u7 >= u1 && u1 > 0 })
    val p = Tables.orders(spark, sfDir)
      .select(col("o_orderdate").cast("date").as("dt"), col("o_custkey"))
      .distinct()
    val naive = p.select(col("dt").as("day")).distinct()
      .join(p, col("dt").between(date_sub(col("day"), 6), col("day")))
      .groupBy("day").agg(countDistinct("o_custkey").as("u7"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    got.foreach { case (day, _, u7) =>
      assert(naive(day) == u7, s"$day: explode form diverges from naive range join")
    }
  }

  test("x196: allocations sum to the budget exactly; extras are 0/1 on largest remainders") {
    val rows = run("x196_lr_allocation").collect()
    assert(rows.map(_.getLong(4)).sum == 10000L, "Σ alloc must be the exact budget")
    assert(rows.forall(r => r.getLong(3) == 0L || r.getLong(3) == 1L))
    assert(rows.forall(r => r.getLong(4) == r.getLong(2) + r.getLong(3)))
    val extras = rows.map(_.getLong(3)).sum
    assert(extras == 10000L - rows.map(_.getLong(2)).sum,
      "exactly the floor shortfall is distributed")
  }

  test("x197: 4-4-5 periods partition the order count; period-of-quarter widths are 4/4/5 weeks") {
    val rows = run("x197_fiscal_445").collect()
    assert(rows.map(_.getLong(3)).sum == Tables.orders(spark, sfDir).count(),
      "every order lands in exactly one fiscal period")
    rows.foreach { r =>
      val (fq, fp) = (r.getLong(1), r.getLong(2))
      assert(fq >= 1 && fq <= 4 && fp >= 1 && fp <= 12)
      assert((fp - 1) / 3 + 1 == fq, "period number must sit inside its quarter")
    }
  }
}
