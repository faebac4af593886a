package graft.queries

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Pins for the k9/q_table_checksum/x121/x122/x123/x124/a26 engine
  * batch (values are under the oracle hash-gate; these pin the DESIGN
  * properties the hash can't see).
  */
class EngineOpsSpec extends SparkSpecBase {

  test("k9: all four delta quadrants are non-empty, so the algebra is exercised") {
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val cutoff = lit("2001-04-01").cast("timestamp")
    val hwm = Relational.k9OrderHwm(spark, sfDir)
    val lOld = li.filter(col("l_shipdate") < cutoff)
    val lNew = li.filter(col("l_shipdate") >= cutoff)
    val oOld = o.filter(col("o_orderkey") <= hwm)
    val oNew = o.filter(col("o_orderkey") > hwm)
    def n(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
      l.join(r, l("l_orderkey") === r("o_orderkey")).count()
    val quads = Seq(n(lOld, oOld), n(lNew, oOld), n(lOld, oNew), n(lNew, oNew))
    assert(quads.forall(_ > 0), s"degenerate quadrant split: $quads")
    // and the quadrants partition the full join
    assert(quads.sum === li.join(o, li("l_orderkey") === o("o_orderkey")).count())
  }

  test("k9: the service-shape refresh over a stored snapshot ≡ the gate form ≡ the full rescan") {
    val tmp = java.nio.file.Files.createTempDirectory("k9_probe_").toString
    try {
      Relational.incrementalJoinSnapshot(spark, sfDir)
        .write.mode("overwrite").parquet(tmp)
      val probe = Relational.incrementalJoinRefresh(spark, sfDir,
        spark.read.parquet(tmp)).collect().map(_.toString).toSeq
      val gate = Relational.queries("k9_incremental_join")(spark, sfDir)
        .collect().map(_.toString).toSeq
      val full = Relational.queries("q_join_view_full")(spark, sfDir)
        .collect().map(_.toString).toSeq
      assert(probe === gate && gate === full)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp)): Unit
  }

  test("q_table_checksum: buckets partition the table; digests are non-degenerate") {
    val rows = Relational.queries("q_table_checksum")(spark, sfDir).collect()
    assert(rows.length === 16)
    assert(rows.map(_.getAs[Long]("n_rows")).sum ===
      Tables.lineitem(spark, sfDir).count())
    // checksum surfaces as a digit string (comparator portability)
    val sums = rows.map(r => BigInt(r.getAs[String]("checksum")))
    assert(sums.forall(_.signum > 0))
    assert(sums.distinct.length === 16, "bucket checksums collided — digest degenerate")
  }

  test("x121: risk sets shrink, events account for every repeat customer, hazard accumulates") {
    val out = Relational.queries("x121_survival_hazard")(spark, sfDir).collect()
    val risk = out.map(_.getAs[Long]("n_risk"))
    assert(risk.zip(risk.tail).forall { case (a, b) => b < a },
      "risk set must strictly shrink between event times")
    val repeaters = Tables.orders(spark, sfDir)
      .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).count()
    assert(out.map(_.getAs[Long]("d_events")).sum === repeaters)
    val cum = out.map(_.getAs[Long]("cum_hazard_ppb"))
    assert(cum.zip(cum.tail).forall { case (a, b) => b >= a })
    assert(risk.head <= Tables.orders(spark, sfDir).select("o_custkey").distinct().count())
  }

  test("x122: the sorted layout actually skips — scanned ⊇ matching, strictly < total somewhere") {
    val out = TrainingData.queries("x122_zone_maps")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("rows_scanned") >= r.getAs[Long]("rows_matching"),
        s"zone pruning dropped matching rows: $r")
    }
    assert(out.exists(r => r.getAs[Long]("n_shards_scanned") < r.getAs[Long]("n_shards_total")),
      "no source skipped any shard — the clustered layout buys nothing")
    // boundary shards only over-scan: scanned rows never exceed matching
    // rows by more than 2 boundary shards' worth
    out.foreach { r =>
      assert(r.getAs[Long]("rows_scanned") - r.getAs[Long]("rows_matching") <= 2L * 256,
        s"over-scan beyond boundary shards: $r")
    }
  }

  test("x123: planted triangle/pendant/chain graph resolves exact support and coefficients") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (5L, 6L), (6L, 7L))
      .toDF("doc_a", "doc_b")
    val got = TrainingData.trianglesOnPairs(pairs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("degree"), r.getAs[Long]("n_triangles"),
          r.getAs[Long]("clustering_ppm")))).toMap
    assert(got(1L) === ((2L, 1L, 1000000L)))
    assert(got(2L) === ((2L, 1L, 1000000L)))
    assert(got(3L) === ((3L, 1L, 333333L)))
    assert(got(4L) === ((1L, 0L, 0L)))
    assert(got(6L) === ((2L, 0L, 0L)))
  }

  test("x124: planted vectors give exact fixed-point moments") {
    import spark.implicits._
    val emb = Seq((1L, Array(1.0f, -1.0f)), (2L, Array(3.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val out = emb
      .select(col("vec_id"),
        posexplode(graft.functions.FixedPointQuantize
          .fixed_point_quantize(col("embedding"))).as(Seq("pos0", "q")))
      .select((col("pos0") + 1).as("pos"), col("q"))
      .groupBy("pos")
      .agg(count(lit(1)).as("n"), sum(col("q").cast("decimal(38,0)")).as("sq"),
        sum((col("q") * col("q")).cast("decimal(38,0)")).as("sqq"))
      .select(col("pos"),
        (col("sq").cast("double") / col("n").cast("double")).as("mean_q"),
        ((col("n").cast("decimal(38,0)") * col("sqq") - col("sq") * col("sq"))
          .cast("double")
          / (col("n").cast("double") * col("n").cast("double"))).as("var_q"))
      .collect().map(r => r.getAs[Long]("pos") ->
        ((r.getAs[Double]("mean_q"), r.getAs[Double]("var_q")))).toMap
    assert(out(1L) === ((2.0e6, 1.0e12))) // values 1e6, 3e6
    assert(out(2L) === ((-1.0e6, 0.0)))   // constant dimension: dead, var 0
  }

  test("x125: prefix-filtered ED join is lossless where j7's heuristic blocks are not") {
    import spark.implicits._
    // "apple"→"bpple" edits the FIRST char: j7's (first,last,len) block
    // misses it by design; the q-gram prefix filter must not.
    val df = Seq((1L, "apple"), (2L, "bpple"), (3L, "applz"), (4L, "zzzzz"))
      .toDF("id", "name")
    val exact = graft.dedup.FuzzyMatch.prefixEditPairs(df, "id", "name", maxDist = 1)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact === Set((1L, 2L), (1L, 3L)))
    val blocked = graft.dedup.FuzzyMatch.blockedNamePairs(df, "id", "name", maxDist = 1)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!blocked.contains((1L, 2L)), "premise broken: blocking caught the first-char edit")
  }

  test("x125: losslessness holds for names too short for the gram theorem") {
    import spark.implicits._
    // "ab"→"cb": one edit destroys the 2-char name's ONLY 2-gram, so
    // the gram path alone yields no candidate (the r9 advice finding);
    // the length-block fallback must still surface the pair. "abc" (3
    // chars = q·d + q − 1 at defaults) has 2 grams ≤ q·d — also short.
    val df = Seq((1L, "ab"), (2L, "cb"), (3L, "abc"), (4L, "xbc"),
      (5L, "zzzzzz")).toDF("id", "name")
    val got = graft.dedup.FuzzyMatch.prefixEditPairs(df, "id", "name", maxDist = 1)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = df.select(col("id"), lower(trim(col("name"))).as("n")).as("a")
      .join(df.select(col("id"), lower(trim(col("name"))).as("n")).as("b"),
        col("a.id") < col("b.id"))
      .filter(levenshtein(col("a.n"), col("b.n")) <= 1)
      .select(col("a.id"), col("b.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.contains((1L, 2L)), "premise broken: the planted pair is real")
    assert(got === naive, s"missing: ${naive -- got}; extra: ${got -- naive}")
  }

  test("x125: recall 1.0 against the naive all-pairs join on real names") {
    val names = Tables.customer(spark, sfDir).filter(col("c_custkey") <= 300)
      .select(col("c_custkey").as("id"), lower(trim(col("c_name"))).as("name"))
    val naive = names.as("a").join(names.as("b"), col("a.id") < col("b.id"))
      .filter(levenshtein(col("a.name"), col("b.name")) <= 1)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pruned = graft.dedup.FuzzyMatch.prefixEditPairs(
      Tables.customer(spark, sfDir).filter(col("c_custkey") <= 300),
      "c_custkey", "c_name", maxDist = 1)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pruned === naive, s"missing: ${naive -- pruned}; extra: ${pruned -- naive}")
  }

  test("x126: inertia is non-negative, covers every vector, and mean is the exact ratio") {
    val out = TrainingData.queries("x126_kmeans_inertia")(spark, sfDir).collect()
    assert(out.map(_.getAs[Long]("n_vecs")).sum ===
      Tables.embeddings(spark, sfDir).count())
    out.foreach { r =>
      val inertia = r.getAs[Double]("inertia")
      assert(inertia >= 0.0, s"negative inertia: $r")
      assert(r.getAs[Double]("mean_dist2") === inertia / r.getAs[Long]("n_vecs"))
    }
  }

  test("d6: the half-open interval lookup resolves change instants and bursts to the new version") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(min: Int) = new Timestamp(1000000000000L + min * 60000L)
    // user 1: versions at t0 ("bronze") and t60 ("silver"), plus a
    // same-instant burst at t60 (event 31 then 32 — the burst's last
    // write wins for any fact at t60)
    val changes = Seq(
      (10L, 1L, "bronze", ts(0)), (31L, 1L, "silver", ts(60)),
      (32L, 1L, "gold", ts(60)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val hist = graft.dims.Scd2.fromChangeLog(changes, "user_id", "ts", "event_id",
      Seq("event_type")).withColumnRenamed("user_id", "h_user")
    val facts = Seq((100L, 1L, ts(30)), (101L, 1L, ts(60)), (102L, 1L, ts(90)))
      .toDF("fact_id", "user_id", "fact_ts")
    val out = facts.join(hist, col("user_id") === col("h_user")
        && col("fact_ts") >= col("effective_from")
        && (col("effective_to").isNull || col("fact_ts") < col("effective_to")))
      .select("fact_id", "event_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(100L -> "bronze", 101L -> "gold", 102L -> "gold"))
    // and the surface query emits exactly one row per sampled fact
    val rows = Relational.queries("d6_scd2_lookup")(spark, sfDir)
    assert(rows.count() ===
      Tables.events(spark, sfDir).filter(col("event_id") % 5 === 0).count())
    assert(rows.select("fact_id").distinct().count() === rows.count())
  }

  test("x127: the measured trade-off points both ways — z-order wins length-only, source-sort wins source predicates") {
    val out = TrainingData.queries("x127_zorder_zonemaps")(spark, sfDir).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("rows_scanned") >= r.getAs[Long]("rows_matching"),
        s"zone pruning dropped matching rows: $r")
    }
    def scanned(layout: String, src: Long, lm: Long) =
      out.find(r => r.getAs[String]("layout") == layout
        && r.getAs[Long]("src_bucket") == src && r.getAs[Long]("len_min") == lm)
        .get.getAs[Long]("rows_scanned")
    // length-only predicates: source-sorting prunes nothing, z-order must
    assert(scanned("zorder", -1L, 100L) < scanned("source", -1L, 100L))
    // source-selective predicates: the single-dim sort's home game
    val srcs = out.map(_.getAs[Long]("src_bucket")).filter(_ >= 0).distinct
    assert(srcs.forall(sb => scanned("source", sb, 100L) <= scanned("zorder", sb, 100L)))
  }

  test("x128: a planted histogram where the top-k covers every key estimates exactly") {
    import spark.implicits._
    val counts = Seq(("a", 3L), ("b", 2L), ("c", 1L)).toDF("k", "c")
    val actual = counts.agg(sum((col("c") * col("c")).cast("decimal(38,0)"))).collect()(0)
      .getDecimal(0).longValueExact()
    assert(actual === 14L) // 9 + 4 + 1 — the self-join sizes per key
    val out = Relational.queries("x128_join_cardinality")(spark, sfDir).collect()(0)
    assert(BigInt(out.getAs[String]("actual_pairs")).signum > 0)
    assert(math.abs(out.getAs[Double]("rel_err")) < 0.2,
      s"estimator off by more than 20%: $out")
  }

  test("x129: systematic PPS hits its target size and weights carry multiplicity") {
    val out = TrainingData.queries("x129_pps_sample")(spark, sfDir).collect()
    val hits = out.map(_.getAs[Long]("n_hits"))
    assert(hits.forall(_ >= 1))
    // systematic sampling yields n or n+1 points depending on the
    // remainder's position relative to the mid-step offset
    assert(hits.sum === TrainingData.PpsSampleN || hits.sum === TrainingData.PpsSampleN + 1,
      s"sample size drifted: ${hits.sum}")
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length === out.length)
  }

  test("q_l_diversity: groups partition the customers and l is bounded by k") {
    val out = Quality.queries("q_l_diversity")(spark, sfDir).collect()
    assert(out.map(_.getAs[Long]("k")).sum === Tables.customer(spark, sfDir).count())
    out.foreach { r =>
      assert(r.getAs[Long]("l_distinct") <= r.getAs[Long]("k"))
      assert((r.getAs[Int]("is_l_diverse") == 1) === (r.getAs[Long]("l_distinct") >= 3))
    }
  }

  test("x131: planted graph — the triangle survives three peels, chain and pendant do not") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (5L, 6L), (6L, 7L))
      .toDF("doc_a", "doc_b")
    val got = graft.dedup.Dedup.kcorePeel(pairs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("in_core"), r.getAs[Long]("core_deg")))).toMap
    assert(got(1L) === ((1, 2L)) && got(2L) === ((1, 2L)) && got(3L) === ((1, 2L)),
      s"triangle must be the 2-core: $got")
    // 4 (pendant) and 5/7 (chain ends) peel round 1; 6 loses both
    // neighbours and peels round 2
    Seq(4L, 5L, 6L, 7L).foreach(n => assert(got(n) === ((0, 0L)), s"node $n: $got"))
  }

  test("x132: no false negatives ever, and the rare-term lookup actually skips shards") {
    val out = TrainingData.queries("x132_shard_blooms")(spark, sfDir).collect()
    assert(out.length === 5)
    out.foreach { r =>
      // maybe ⊇ true is the Bloom invariant — a negative n_false_pos
      // would mean a false negative
      assert(r.getAs[Long]("n_false_pos") >= 0L, s"false negative: $r")
      assert(r.getAs[Long]("n_maybe") >= r.getAs[Long]("n_true"))
    }
    assert(out.exists(_.getAs[Long]("skip_ppm") > 0L),
      "no probe term skipped any shard — the filter demonstrates nothing")
  }

  test("a26: the sketch margins at spec SF are well inside the verdict bounds") {
    val li = Tables.lineitem(spark, sfDir).select(col("l_partkey"),
      year(col("l_shipdate")).as("yr"))
    val inA = col("yr") === 1997
    val inB = col("yr") === 1998
    val r = li.filter(inA || inB).agg(
      countDistinct(when(inA, col("l_partkey"))).as("xa"),
      countDistinct(when(inB, col("l_partkey"))).as("xb"),
      countDistinct(col("l_partkey")).as("xu"),
      approx_count_distinct(when(inA, col("l_partkey")), 0.02).as("ea"),
      approx_count_distinct(when(inB, col("l_partkey")), 0.02).as("eb"),
      approx_count_distinct(col("l_partkey"), 0.02).as("eu")).collect()(0)
    val (xa, xb, xu) = (r.getAs[Long]("xa"), r.getAs[Long]("xb"), r.getAs[Long]("xu"))
    val (ea, eb, eu) = (r.getAs[Long]("ea"), r.getAs[Long]("eb"), r.getAs[Long]("eu"))
    def rel(e: Long, x: Long) = math.abs(e - x).toDouble / x
    assert(rel(ea, xa) < 0.05 && rel(eb, xb) < 0.05)
    val exactI = xa + xb - xu
    val estI = ea + eb - eu
    assert(exactI > 0 && rel(estI, exactI) < 0.10,
      s"inclusion-exclusion drifted: est $estI vs exact $exactI")
  }
}
