package graft.queries

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Pins for the x87/x88/x89 stats-family operators (values are under
  * the oracle hash-gate): distribution completeness, LOCF carry
  * semantics, and histogram tiling. */
class StatsOpsSpec extends SparkSpecBase {

  test("x87: digit shares partition the rows; ppm sums to ~1e6") {
    val rows = Relational.queries("x87_benford_audit")(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("digit")).toSet.subsetOf((1 to 9).toSet))
    val n = Tables.orders(spark, sfDir).filter(col("o_totalprice") >= 1.0).count()
    assert(rows.map(_.getAs[Long]("n_obs")).sum === n)
    val ppmSum = rows.map(_.getAs[Long]("obs_ppm")).sum
    // floor-ppm loses < 1 ppm per digit
    assert(ppmSum > 1000000L - 9 && ppmSum <= 1000000L)
  }

  test("x88: locf carries the most recent observation and leaves lead-in days null") {
    val out = Relational.queries("x88_locf_impute")(spark, sfDir).collect()
    val byCust = out.groupBy(_.getAs[Long]("o_custkey"))
    byCust.foreach { case (_, days) =>
      var carried: Option[Double] = None
      days.sortBy(_.getAs[java.sql.Date]("day").toString).foreach { r =>
        if (!r.isNullAt(r.fieldIndex("day_price")))
          carried = Some(r.getAs[Double]("day_price"))
        carried match {
          case Some(v) => assert(r.getAs[Double]("locf_price") === v, s"carry broken: $r")
          case None => assert(r.isNullAt(r.fieldIndex("locf_price")), s"lead-in not null: $r")
        }
      }
    }
  }

  test("x90: the deadline governs against the LATEST preceding view, planted sequences") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(min: Int) = new Timestamp(1000000000000L + min * 60000L)
    // A converts (30 min), B misses (120 min), C has purchase BEFORE
    // view (never converts), D converts off its SECOND view (75 min
    // after the first, 15 after the second — latest view governs)
    val ev = Seq(
      (1L, 10L, "view", ts(0)), (2L, 10L, "purchase", ts(30)),
      (3L, 20L, "view", ts(0)), (4L, 20L, "purchase", ts(120)),
      (5L, 30L, "purchase", ts(0)), (6L, 30L, "view", ts(10)),
      (7L, 40L, "view", ts(0)), (8L, 40L, "view", ts(60)), (9L, 40L, "purchase", ts(75)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val conv = ev
      .withColumn("last_view_ts",
        max(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("conv",
        when(col("event_type") === "purchase" && col("last_view_ts").isNotNull &&
          col("ts") <= col("last_view_ts") + expr("INTERVAL 1 HOUR"), 1).otherwise(0))
      .filter(col("conv") === 1)
      .select("user_id").collect().map(_.getLong(0)).toSet
    assert(conv === Set(10L, 40L), s"converting users: $conv")
  }

  test("x92: the slope formula recovers planted linear trends exactly") {
    import spark.implicits._
    // y = 100 - 10x (declining), y = 5x + 7 (growing), constant y
    val m = Seq.tabulate(12)(x => (1L, x.toLong, 100L - 10L * x)) ++
      Seq.tabulate(6)(x => (2L, x.toLong, 5L * x + 7L)) ++
      Seq.tabulate(4)(x => (3L, x.toLong, 42L))
    val g = m.toDF("o_custkey", "x", "y").groupBy("o_custkey").agg(
      count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("o_custkey"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")).as("slope"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(g(1L) === -10.0 && g(2L) === 5.0 && g(3L) === 0.0, s"$g")
    // and the surface query's flag is the sign of its slope
    val out = Relational.queries("x92_spend_trend")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Int]("declining") === (if (r.getAs[Double]("slope_cents") < 0) 1 else 0))
      assert(r.getAs[Long]("n_months") >= 2)
    }
  }

  test("x93: lateness buckets are exact on a hand-built arrival sequence") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)
    // arrival order (by sk column stand-in): we pin the WINDOW LOGIC by
    // ordering on an explicit arrival column: events arrive t=100,
    // t=0 (100 s late → bucket 6), t=40 (60 s late → bucket 5), t=200
    // (new hwm → -1)
    val ev = Seq((1L, ts(100)), (2L, ts(0)), (3L, ts(40)), (4L, ts(200)))
      .zipWithIndex.map { case ((id, t), arr) => (id, 1L, t, arr) }
      .toDF("event_id", "user_id", "ts", "arrival")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("arrival")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val buckets = ev.withColumn("hwm", max("ts").over(w))
      .select((unix_timestamp(col("hwm")) - unix_timestamp(col("ts"))).as("late_sec"))
      .select(when(col("late_sec") <= 0, lit(-1))
        .otherwise(length(bin(col("late_sec"))) - 1).as("b"))
      .collect().map(_.getInt(0)).toSeq.sorted
    assert(buckets === Seq(-1, -1, 5, 6), s"got $buckets")
    // surface query: histogram partitions the event count
    val out = Relational.queries("x93_lateness_profile")(spark, sfDir).collect()
    assert(out.map(_.getAs[Long]("n_events")).sum ===
      graft.Tables.events(spark, sfDir).count())
  }

  test("x94: winsorized mean resists a planted outlier the raw mean follows") {
    val r = Relational.queries("x94_robust_mean")(spark, sfDir).collect().head
    assert(r.getAs[Double]("p05") <= r.getAs[Double]("p95"))
    assert(r.getAs[Long]("n_clamped") <= r.getAs[Long]("n") / 9,
      "5%+5% tails clamp at most ~11% of rows")
    // both means sit inside the clamp band... the winsorized one must
    val wm = r.getAs[Double]("winsorized_mean")
    assert(wm >= r.getAs[Double]("p05") && wm <= r.getAs[Double]("p95"))
  }

  test("a23: unpivot plans ONE scan + one Expand, partials combine before the exchange") {
    val plan = Relational.queries("a23_unpivot")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("lineitem\\.parquet".r.findAllIn(plan).length === 1,
      s"the melt must not scan per metric:\n$plan")
    assert("Expand".r.findAllIn(plan).length === 1, s"one Expand:\n$plan")
    assert(plan.contains("partial_count"),
      s"long-form aggregate must map-combine:\n$plan")
  }

  test("p10: NOT IN plans the null-aware anti join and drops NULL probe rows") {
    val df = Relational.queries("p10_not_in_nullable")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // toString prints the BHJ's isNullAware flag positionally:
    // "BroadcastHashJoin [...] LeftAnti, BuildRight, true"
    assert("LeftAnti, BuildRight, true".r.findFirstIn(plan).isDefined,
      s"nullable NOT IN must plan the null-aware anti join:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(!rows.exists(_.isNullAt(1)),
      "ANSI tri-valued logic: NULL probe keys never satisfy NOT IN")
    // and the excluded range really is excluded
    assert(!rows.exists(r => r.getLong(1) < 20))
  }

  test("a24: MoM/YoY deltas follow from the month sums; edge months stay NULL") {
    val rows = Relational.queries("a24_period_over_period")(spark, sfDir).collect()
    val byMonth = rows.map(r => r.getAs[java.sql.Date]("month").toString ->
      r).toMap
    val first = rows.minBy(_.getAs[java.sql.Date]("month").toString)
    assert(first.isNullAt(2) && first.isNullAt(3),
      "no prior month/year for the first month")
    // recompute one interior MoM by hand from the emitted cents
    val interior = rows.filter(r => !r.isNullAt(2)).head
    val m = interior.getAs[java.sql.Date]("month").toString
    val prevKey = {
      val d = java.time.LocalDate.parse(m).minusMonths(1)
      d.toString
    }
    val expect = interior.getLong(1).toDouble * 1000000.0 /
      byMonth(prevKey).getLong(1).toDouble - 1000000.0
    assert(interior.getDouble(2) === expect, s"MoM at $m")
  }

  test("x114: planted linear dailies recover exact slope/intercept and r2 = 1") {
    import spark.implicits._
    import java.sql.Timestamp
    def tsd(d: Int) = new Timestamp(1700006400000L + d * 86400000L)
    val dir = java.nio.file.Files.createTempDirectory("graft_regr").toString
    // "lin": one event per day, revenue 100 + 10·d dollars → exact line
    // "fall": 500 − 5·d dollars → negative slope, still exact
    val rows = (0 until 10).flatMap { d =>
      Seq((100L + d, tsd(d), 1L, "lin", 100.0 + 10.0 * d),
          (200L + d, tsd(d), 2L, "fall", 500.0 - 5.0 * d))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Relational.queries("x114_regr_trend")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("lin") === ((10L, 1000.0, 10000.0, 1.0)), s"lin: $got")
    assert(got("fall") === ((10L, -500.0, 50000.0, 1.0)), s"fall: $got")
  }

  test("x113: hand-computed KS on two planted sources; sup lands on a skipped grid step") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ks").toString
    // srcA = lengths 1..4, srcB = four docs of length 10. Global grid
    // {1,2,3,4,10}; each source's sup (16/32 = 0.5) occurs at a step
    // the OTHER source contributes — the dense-grid evaluation is
    // exactly what a source-local ECDF would miss.
    val rows = (1 to 4).map(i => (i.toLong, "t", "en", "srcA", i.toLong)) ++
      (5 to 8).map(i => (i.toLong, "t", "en", "srcB", 10L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TrainingData.queries("x113_ks_drift")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === Map("srcA" -> ((4L, 0.5)), "srcB" -> ((4L, 0.5))), s"ks: $got")
  }

  test("x115: the planted outlier moves the mean but not (median, MAD)") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(min: Int) = new Timestamp(1700006400000L + min * 60000L)
    val dir = java.nio.file.Files.createTempDirectory("graft_mad").toString
    // odd: 1,2,3,4,100 dollars → median 300c, devs 2·{200,100,0,100,9700}
    //      → MAD 100c (the 100-dollar outlier contributes nothing)
    // even: 1,2,3,4 → median 250c, dev2 {300,100,100,300} → MAD 100c
    val rows = Seq(1.0, 2.0, 3.0, 4.0, 100.0).zipWithIndex.map {
        case (v, i) => (i.toLong, ts(i), 1L, "odd", v) } ++
      Seq(1.0, 2.0, 3.0, 4.0).zipWithIndex.map {
        case (v, i) => (10L + i, ts(i), 2L, "even", v) }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Relational.queries("x115_mad_spread")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got === Map(
      "odd" -> ((5L, 300.0, 100.0)),
      "even" -> ((4L, 250.0, 100.0))), s"mad: $got")
  }

  test("x116: credit splits equally, mirrors the touch window, drops the uncredited") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(min: Int) = new Timestamp(1700006400000L + min * 60000L)
    val dir = java.nio.file.Files.createTempDirectory("graft_attr").toString
    Seq(
      // u1: two views then a $12 purchase 30 min later → 600M µc each;
      // a second purchase at t90 has NO view in [t30,t90] → unattributed
      (1L, ts(0), 1L, "view", 0.0), (2L, ts(10), 1L, "view", 0.0),
      (3L, ts(30), 1L, "purchase", 12.0), (4L, ts(90), 1L, "purchase", 99.0),
      // u2 (shifted +2h): view and $5 purchase at the SAME instant —
      // the same-instant tie credits (both frames are inclusive)
      (5L, ts(120), 2L, "view", 0.0), (6L, ts(120), 2L, "purchase", 5.0),
      // u3: purchase 61 min after the view → outside; view drops
      (7L, ts(0), 3L, "view", 0.0), (8L, ts(61), 3L, "purchase", 7.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Relational.queries("x116_attribution")(spark, dir)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      0 -> ((2L, 1200000000L)),
      2 -> ((1L, 500000000L))), s"attribution: $got")
  }

  test("x89: buckets tile [min,max] and counts partition the fact") {
    val rows = Relational.queries("x89_histogram")(spark, sfDir).collect()
    val n = Tables.lineitem(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum === n)
    val sorted = rows.sortBy(_.getAs[Long]("bucket"))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("bucket") < b.getAs[Long]("bucket"))
        // edges are a contiguous tiling (same arithmetic ⇒ exact equality)
        assert(a.getAs[Double]("hi_edge") === b.getAs[Double]("lo_edge")
          || a.getAs[Long]("bucket") + 1 != b.getAs[Long]("bucket"))
      case _ =>
    }
  }
}
