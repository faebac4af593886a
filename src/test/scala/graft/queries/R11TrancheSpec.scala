package graft.queries

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Targeted pins for the r11 tranche (X191-X196): invariants the
  * DuckDB hash gate cannot express — cross-aggregate consistency,
  * independent in-process recomputation, and bound checks. */
class R11TrancheSpec extends SparkSpecBase {

  test("x167 BM25: scores positive, bounded terms, deterministic top-10") {
    val q = TrainingData.queries("x167_bm25_topk")
    val rows = q(spark, sfDir).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0, "single-term contributions are positive, so sums are")
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 5, "1..5 query terms per doc")
    }
    assert(q(spark, sfDir).collect().toSeq == rows.toSeq, "same top-10 every run")
  }

  test("x168 linkage: verdicts partition candidates; scores within weight bounds") {
    val rows = TrainingData.queries("x168_linkage_score")(spark, sfDir).collect()
    val verdicts = rows.map(_.getString(0)).toSet
    assert(verdicts.subsetOf(Set("match", "possible", "non_match")))
    rows.foreach { r =>
      assert(r.getLong(2) >= -693L - 511L - 916L, "min below total disagreement weight")
      assert(r.getLong(3) <= 2197L + 1386L + 2996L, "max above total agreement weight")
    }
    assert(rows.map(_.getLong(1)).sum > 0, "sorted neighborhood must yield candidates")
  }

  test("x169 interval join equals an independent in-process overlap loop") {
    import java.time.temporal.ChronoUnit
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("st"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val promos = orders.map(_._2.withDayOfMonth(1)).distinct
    val agg = scala.collection.mutable.Map.empty[String, (Long, Long)]
    for ((k, st) <- orders; p <- promos) {
      val en = st.plusDays(k % 7 + 1)
      val pEn = p.plusDays(10)
      val lo = if (st.isAfter(p)) st else p
      val hi = if (en.isBefore(pEn)) en else pEn
      val ov = ChronoUnit.DAYS.between(lo, hi)
      if (ov > 0) {
        val m = f"${p.getYear}%04d-${p.getMonthValue}%02d"
        val (n, t) = agg.getOrElse(m, (0L, 0L))
        agg(m) = (n + 1, t + ov)
      }
    }
    val got = Warehouse.queries("x169_interval_join")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == agg.toMap, "grid-blocked equi-join must equal the naive overlap loop")
  }

  test("x170 novelty: first doc fully novel; novel counts sum to distinct shingles") {
    val res = TrainingData.queries("x170_novelty")(spark, sfDir).collect()
    val firstDoc = res.map(_.getLong(0)).min
    val first = res.find(_.getLong(0) == firstDoc).get
    assert(first.getLong(2) == first.getLong(1) && first.getLong(3) == 1000000L,
      "the earliest doc owns every one of its shingles")
    val totalNovel = res.map(_.getLong(2)).sum
    val distinctSh = graft.dedup.Dedup
      .docShingles(Tables.documents(spark, sfDir), n = 5)
      .select("sh").distinct().count()
    assert(totalNovel == distinctSh,
      "every distinct shingle is novel for exactly one doc")
    res.foreach(r => assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000L))
  }

  test("x171 merge: action counts match the change-set classes; row balance holds") {
    val o = Tables.orders(spark, sfDir)
    val nState = o.count()
    val k = col("o_orderkey")
    val nUpd = o.filter(pmod(k, lit(5L)) === 1).count()
    val nDel = o.filter(pmod(k, lit(5L)) === 2 && pmod(k, lit(7L)) === 0).count()
    val nIns = o.filter(pmod(k, lit(5L)) === 3).count()
    val rows = Warehouse.queries("x171_merge_upsert")(spark, sfDir).collect()
    assert(rows.map(_.getLong(3)).sum == nUpd)
    assert(rows.map(_.getLong(5)).sum == nDel)
    assert(rows.map(_.getLong(4)).sum == nIns)
    assert(rows.map(_.getLong(1)).sum == nState - nDel + nIns,
      "post-merge cardinality = state - deletes + inserts")
  }

  test("t5 sliding windows: every event lands in exactly win/slide windows") {
    val t5 = Cdc.queries("t5_sliding_window")(spark, sfDir).collect()
    val nEvents = Tables.events(spark, sfDir).count()
    assert(t5.map(_.getLong(2)).sum == 4 * nEvents,
      "1-day/6-hour sliding windows must count each event exactly 4 times")
    val t2 = Cdc.queries("t2_tumbling_window")(spark, sfDir).collect()
    assert(t5.map(_.getLong(2)).sum == 4 * t2.map(_.getLong(2)).sum)
  }

  test("x173 media near-dups: byte-identical payloads pair at 16/16; bounds hold") {
    val rows = TrainingData.queries("x173_media_neardups")(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "canonical a<b pairs only")
      assert(r.getInt(2) >= 12 && r.getInt(2) <= 16)
    }
    // exact text dups (same bytes, >=16 of them) must surface as 16/16
    val docs = Tables.documents(spark, sfDir)
      .filter(length(col("text").cast("binary")) >= 16)
      .select(col("doc_id"), md5(col("text")).as("h"))
    val dupPairs = docs.as("a").join(docs.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sixteens = rows.filter(_.getInt(2) == 16)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dupPairs.subsetOf(sixteens),
      s"byte-identical payload pairs must all score 16/16: missing ${dupPairs -- sixteens}")
  }

  test("x174 dedup horizon: buckets partition all repeats; cumulative reaches 100%") {
    val rows = TrainingData.queries("x174_dedup_horizon")(spark, sfDir).collect()
    val ev = Tables.events(spark, sfDir)
    val totalRepeats = ev.count() -
      ev.select("user_id", "event_type").distinct().count()
    assert(rows.map(_.getLong(1)).sum == totalRepeats,
      "every consecutive (user, type) repeat falls in exactly one bucket")
    assert(rows.last.getLong(2) == 1000000L, "last cumulative bucket = 100%")
    assert(rows.map(_.getLong(2)).toSeq == rows.map(_.getLong(2)).toSeq.sorted,
      "captured fraction is monotone in the bucket order")
  }

  test("x175 incremental stats: shard-width invariant (mergeability) and variance sane") {
    val o = Tables.orders(spark, sfDir)
    val w4096 = Warehouse.shardedStats(o, 4096).collect().map(_.toSeq)
    val w1000 = Warehouse.shardedStats(o, 1000).collect().map(_.toSeq)
    val w1 = Warehouse.shardedStats(o, 1).collect().map(_.toSeq)
    assert(w4096.toSeq == w1000.toSeq && w4096.toSeq == w1.toSeq,
      "merged partials must be independent of the shard layout — that IS mergeability")
    // the integer milli-variance tracks Spark's double var_pop closely
    val ref = o.select(col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").cast("double").as("x"))
      .groupBy("o_orderstatus").agg(var_pop(col("x")).as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    Warehouse.shardedStats(o, 4096).collect().foreach { r =>
      val got = r.getLong(4) / 1000.0
      val want = ref(r.getString(0))
      assert(math.abs(got - want) / want < 1e-6,
        s"${r.getString(0)}: integer variance $got vs Spark var_pop $want")
    }
  }

  test("x176 equi-depth histogram: 8 buckets partition the table, ranges nest") {
    val rows = Warehouse.queries("x176_equidepth_hist")(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq == (0 to 7), "all 8 buckets present")
    val total = Tables.orders(spark, sfDir).count()
    assert(rows.map(_.getLong(3)).sum == total, "buckets partition every row")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(2) <= b.getDouble(1),
        "bucket value ranges are ordered: hi(k) <= lo(k+1)")
    case _ => }
  }

  test("x177 seasonal anomaly: cells cover all events; 3-MAD flags a robust minority") {
    val rows = Relational.queries("x177_seasonal_anomaly")(spark, sfDir).collect()
    val nEvents = Tables.events(spark, sfDir).count()
    assert(rows.map(_.getLong(2)).sum == nEvents, "dow x hour cells cover every event")
    rows.foreach { r =>
      assert(r.getDouble(4) >= 0.0, "MAD is non-negative")
      assert(r.getLong(5) * 2 < r.getLong(2),
        "by MAD's definition, >3-MAD residuals are a minority of the cell")
    }
  }

  test("x172 local top-k audit: partials never exceed exact; exact side is the true top-20") {
    val rows = TrainingData.queries("x172_local_topk_audit")(spark, sfDir).collect()
    assert(rows.length <= 20)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "shard-truncated partial <= exact")
      assert(r.getLong(4) == r.getLong(1) - r.getLong(2))
      assert((r.getInt(3) == 1) == (r.getLong(2) > 0))
    }
    val exact = Tables.documents(spark, sfDir)
      .select(explode(graft.text.TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("tok")).limit(20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap == exact,
      "the audit's exact side must be the true global top-20")
  }
}
