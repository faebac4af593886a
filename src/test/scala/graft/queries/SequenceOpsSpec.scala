package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Planted-data end-to-end pins for the sequence/anomaly/index batch
  * (x98 sessionization, x99 transition matrix, x100 rolling anomaly,
  * x101 capped postings). Each test writes a tiny synthetic table in
  * the driver layout and runs the REGISTERED query against it, so the
  * full pipeline — not a re-implementation — is what's asserted.
  * Corpus-scale values are under the oracle hash-gate. */
class SequenceOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)

  private def eventsDir(rows: Seq[(Long, java.sql.Timestamp, Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_seq").toString
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("x98: the 30-min gap rule splits planted streams exactly") {
    // user 1: events at 0,10,20 | 60,65 | 200 → sessions of 3, 2, 1
    // user 2: single event → session of 1
    // boundary: user 3 at 0 and exactly 30 → SAME session (rule is >30)
    val dir = eventsDir(Seq(
      (1L, ts(0), 1L, "view"), (2L, ts(10), 1L, "view"), (3L, ts(20), 1L, "click"),
      (4L, ts(60), 1L, "view"), (5L, ts(65), 1L, "purchase"),
      (6L, ts(200), 1L, "view"),
      (7L, ts(0), 2L, "view"),
      (8L, ts(0), 3L, "view"), (9L, ts(30), 3L, "view")))
    val got = Relational.queries("x98_sessionize")(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 1L),
      s"histogram: two 1-event sessions (u1 tail, u2), two 2-event (u1 mid, u3), one 3-event: $got")
  }

  test("x99: pair counts and ppm rows from a planted chain") {
    // user 1: a→b→a→b ; user 2: a→a → pairs a→b ×2, b→a ×1, a→a ×1
    val dir = eventsDir(Seq(
      (1L, ts(0), 1L, "a"), (2L, ts(1), 1L, "b"),
      (3L, ts(2), 1L, "a"), (4L, ts(3), 1L, "b"),
      (5L, ts(0), 2L, "a"), (6L, ts(1), 2L, "a")))
    val got = Relational.queries("x99_transition_matrix")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      ("a", "a") -> ((1L, 333333L)),   // 1 of 3 from-a pairs
      ("a", "b") -> ((2L, 666666L)),
      ("b", "a") -> ((1L, 1000000L))), s"matrix: $got")
  }

  test("x100: a planted spike day is the only anomaly; flat series never flags") {
    // one type, 10 consecutive days (midnight-aligned) of count 5,
    // except index 8 has 50. Day 8 judges against the flat prior week
    // (variance 0, x≠μ) → flags; day 9 judges against a baseline that
    // CONTAINS the spike and must not flag — the exclusion-window
    // design the inclusive form gets wrong on both counts.
    def tsd(d: Int, i: Int) = // 2023-11-15 00:00 UTC + d days + i min
      new java.sql.Timestamp(1700006400000L + (d * 24 * 60 + i) * 60000L)
    val rows = (0 until 10).flatMap { d =>
      val n = if (d == 8) 50 else 5
      (0 until n).map(i => (d * 100L + i, tsd(d, i), 1L, "steady"))
    }
    val dir = eventsDir(rows)
    val got = Relational.queries("x100_rolling_anomaly")(spark, dir)
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        ((r.getAs[Long]("n_events"), r.getAs[Int]("anomaly")))).toMap
    assert(got.size === 3, s"only days 7-9 carry a full 7-day baseline: $got")
    val flagged = got.collect { case (day, (_, 1)) => day }
    assert(flagged.toSeq === Seq("2023-11-23"),
      s"only the spike day (planted index 8) flags: $got")
    assert(got("2023-11-23")._1 === 50L)
  }

  test("x101: two-phase capped postings equal the naive smallest-20; df/tf exact") {
    // 'hot' appears in 50 docs (twice in each even doc), 'rare' in 3
    val docs = (0 until 50).map { i =>
      val hot = if (i % 2 == 0) "hot hot" else "hot"
      val rare = if (i < 3) " rare" else ""
      (i.toLong, s"$hot$rare", "en", s"src_${i % 4}", 10L)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_post").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TrainingData.queries("x101_postings")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got("hot")._1 === 50L, "df counts distinct docs")
    assert(got("hot")._2 === 75L, "tf counts occurrences (25 doubles + 25 singles)")
    assert(got("hot")._3 === (0L until 20L).mkString(","),
      "capped head = 20 smallest doc ids, comma-joined (portable output)")
    assert(got("rare") === ((3L, 3L, "0,1,2")))
  }

  test("x102: interval weights recover a hand-computed TWAP; last observation carries none") {
    // user 1: 100.00 held 10 min, 200.00 held 30 min, 999.99 last (no
    // weight) → (10000·10 + 20000·30) / 40 = 17500 cents
    val dir = java.nio.file.Files.createTempDirectory("graft_twap").toString
    Seq((1L, ts(0), 1L, "v", 100.0), (2L, ts(10), 1L, "v", 200.0),
        (3L, ts(40), 1L, "v", 999.99))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Relational.queries("x102_twap")(spark, dir).collect()
    assert(r.length === 1)
    assert(r(0).getLong(1) === 2L, "two closed intervals")
    assert(r(0).getDouble(2) === 17500.0, s"hand TWAP: ${r(0)}")
  }

  test("x103: cells partition the users; ppm/lift/chi2 follow from the cells exactly") {
    val r = Relational.queries("x103_ab_lift")(spark, sfDir).collect()(0)
    val Seq(a, b, c, d) = Seq(0, 1, 2, 3).map(r.getLong)
    val users = graft.Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(a + b + c + d === users, "cells partition the user base")
    assert(r.getLong(4) === a * 1000000 / (a + b))
    assert(r.getLong(6) === r.getLong(5) - r.getLong(4), "lift = b_ppm - a_ppm")
    val chi2 = (a + b + c + d).toDouble * (a * d - b * c).toDouble *
      (a * d - b * c).toDouble /
      ((a + b).toDouble * (c + d).toDouble * (a + c).toDouble * (b + d).toDouble)
    assert(r.getDouble(7) === chi2, "fixed-order IEEE chi-square")
  }

  test("x104: planted ticks produce hand-computed OHLC bars; order key governs open/close") {
    // bar-aligned base (1700006400 s is a multiple of 900): one bar
    // with ticks 5,1,9,3 → open 500, high 900, low 100, close 300;
    // a second bar at +20 min with a single tick
    def t(min: Int) = new java.sql.Timestamp(1700006400000L + min * 60000L)
    val dir = java.nio.file.Files.createTempDirectory("graft_ohlc").toString
    Seq((1L, t(0), 1L, "tick", 5.0), (2L, t(1), 1L, "tick", 1.0),
        (3L, t(2), 1L, "tick", 9.0), (4L, t(3), 1L, "tick", 3.0),
        (5L, t(20), 1L, "tick", 7.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = Relational.queries("x104_ohlc_bars")(spark, dir)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    assert(rows.toSeq === Seq((500L, 900L, 100L, 300L, 4L),
      (700L, 700L, 700L, 700L, 1L)), s"bars: ${rows.toSeq}")
  }

  test("x105: a planted level shift accumulates past the threshold; the pre-shift half never flags") {
    // 10 days of 10 events, then 10 days of 20 → k = 15; post-shift
    // cusum climbs 5/day off its running floor and crosses 2k = 30 on
    // day 17 (cusum 35). The +30% sustained step x116's per-day 3σ
    // test is blind to.
    def tsd(d: Int, i: Int) =
      new java.sql.Timestamp(1700006400000L + (d * 24 * 60 + i) * 60000L)
    val rows = (0 until 20).flatMap { d =>
      val n = if (d < 10) 10 else 20
      (0 until n).map(i => (d * 100L + i, tsd(d, i), 1L, "steady"))
    }
    val dir = eventsDir(rows)
    val got = Relational.queries("x105_cusum_shift")(spark, dir)
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        ((r.getAs[Long]("cusum"), r.getAs[Int]("shifted")))).toMap
    assert(got.size === 20)
    val flagged = got.collect { case (day, (_, 1)) => day }.toSeq.sorted
    assert(flagged === Seq("2023-12-01", "2023-12-02", "2023-12-03", "2023-12-04"),
      s"days 17-20 (cusum 35..50) flag; nothing before: $got")
    assert(got("2023-11-24")._1 === 0L, "pre-shift cusum pinned to the floor")
  }

  test("x106: pair support from planted baskets; re-lined parts count once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_basket").toString
    // order 1: {1,2,3}; order 2: {1,2}; order 3: {1,2} with part 1 on
    // two lines (must dedup to the (order, part) grain)
    Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L),
        (3L, 1L), (3L, 1L), (3L, 2L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Relational.queries("x106_basket_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map((1L, 2L) -> 3L, (1L, 3L) -> 1L, (2L, 3L) -> 1L),
      s"support: $got")
  }

  test("x107: bitmask matrix equals hand-counted pairwise intersections") {
    // u1 {view, click}, u2 {view}, u3 {click, purchase}
    val dir = eventsDir(Seq(
      (1L, ts(0), 1L, "view"), (2L, ts(1), 1L, "click"),
      (3L, ts(0), 2L, "view"),
      (4L, ts(0), 3L, "click"), (5L, ts(1), 3L, "purchase")))
    val got = Relational.queries("x107_audience_overlap")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      ("view", "view") -> 2L, ("view", "click") -> 1L,
      ("click", "click") -> 2L, ("click", "purchase") -> 1L,
      ("purchase", "purchase") -> 1L), s"matrix: $got")
  }

  test("x108: WAU covers the trailing 7 days exactly; stickiness from planted activity") {
    // u1 active on days 0 and 3, u2 on day 0 (midnight-aligned).
    // Output rows exist only for active days: day0 dau=2 wau=2,
    // day3 dau=1 wau=2 (both users' day-0 activity still covers day 3)
    def tsd(d: Int) =
      new java.sql.Timestamp(1700006400000L + d * 24 * 3600 * 1000L)
    val dir = eventsDir(Seq(
      (1L, tsd(0), 1L, "view"), (2L, tsd(3), 1L, "view"),
      (3L, tsd(0), 2L, "view")))
    val got = Relational.queries("x108_active_users")(spark, dir)
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      "2023-11-15" -> ((2L, 2L, 1000000L)),
      "2023-11-18" -> ((1L, 2L, 500000L))), s"dau/wau/stickiness: $got")
  }

  test("x109: paths assemble in event order; short journeys drop; ties counted") {
    // u1 and u3 share a>b>a>b>a; u2 has only 4 events (dropped)
    val seq5 = Seq("a", "b", "a", "b", "a")
    val rows =
      seq5.zipWithIndex.map { case (t, i) => (10L + i, ts(i), 1L, t) } ++
      Seq.tabulate(4)(i => (20L + i, ts(i), 2L, "a")) ++
      seq5.zipWithIndex.map { case (t, i) => (30L + i, ts(i), 3L, t) }
    val got = Relational.queries("x109_top_paths")(spark, eventsDir(rows.map {
        case (id, t, u, ty) => (id.toLong, t, u, ty) }))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a>b>a>b>a" -> 2L), s"paths: $got")
  }

  test("x110: band-crossing Pareto classes match the hand-computed 80/95 cuts") {
    // revenues 2,000,000 / 600,000 / 300,000 / 100,000 cents: part 1
    // lands in band 1 (≥2²⁰), the rest in band 0 — the triangular band
    // prefix is exercised. cum_before: 0, 2.0M, 2.6M, 2.9M of 3.0M →
    // A={p1,p2}, B={p3}, C={p4}
    val dir = java.nio.file.Files.createTempDirectory("graft_abc").toString
    Seq((1L, 20000.0), (2L, 6000.0), (3L, 3000.0), (4L, 1000.0))
      .toDF("l_partkey", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Relational.queries("x110_abc_classes")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      "A" -> ((2L, 2600000L, 866666L)),
      "B" -> ((1L, 300000L, 100000L)),
      "C" -> ((1L, 100000L, 33333L))), s"classes: $got")
  }

  test("x111: within-bucket, boundary, and empty-bucket-spanning gaps all surface") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gaps").toString
    // buckets (div 8192): {0,1,5,8191} | {8193} | {20000} — gaps inside
    // bucket 0, across the 0/1 boundary, and across the EMPTY bucket 2
    Seq(0L, 1L, 5L, 8191L, 8193L, 20000L).toDF("l_orderkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Relational.queries("x111_id_gaps")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (2L, 4L, 3L), (6L, 8190L, 8185L),
      (8192L, 8192L, 1L), (8194L, 19999L, 11806L)), s"gaps: ${got.toSeq}")
  }

  test("x98/x100 plans: one fact-wide exchange; anomaly windows run on the bounded grain") {
    val sess = Relational.queries("x98_sessionize")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the session windows and the (user, sess) aggregate share the
    // user_id partitioning — no exchange between them
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(sess).length === 1,
      s"fact partitioned by user exactly once:\n$sess")
    val anom = Relational.queries("x100_rolling_anomaly")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the only pre-window aggregate is map-side combined: partial_count
    // appears below the (type, day) exchange
    assert(anom.contains("partial_count"),
      s"daily grain must combine map-side before its exchange:\n$anom")
  }
}
