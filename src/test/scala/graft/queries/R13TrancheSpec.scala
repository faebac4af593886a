package graft.queries

import graft.{SparkSpecBase, Tables}
import graft.text.{CorpusStats, TextFunctions}
import org.apache.spark.sql.functions._

/** Behavior pins for the round-13 tranche (X236-X238): char-diversity
  * collision arithmetic, Zipf rank-bucket interval splitting, and
  * duplicated-shingle exposure — every case a PLANTED positive with
  * hand-computed exact values (the r12 vacuity lesson applied at
  * birth: no gate in this tranche can pass on an empty/zero result).
  */
class R13TrancheSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sfDir)

  test("x211: collision/top-char ppm recompute exactly on planted docs") {
    val docs = Seq(
      (1L, "aaaa"),      // 1 distinct char, collision saturates at 1e6
      (2L, "abcdef"),    // all-distinct: collision 0, keep
      (3L, "aabb"),      // sum c(c-1) = 4 over N(N-1) = 12 -> 333333
      (4L, "")           // empty: all zeros, no NPE / no lost row
    ).toDF("doc_id", "text")
    val r = CorpusStats.charStats(docs).orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getInt(5)))
    assert(r(0) == ((1L, 4L, 1L, 1000000L, 1000000L, 0)))
    assert(r(1) == ((2L, 6L, 6L, 0L, 166666L, 1)))
    assert(r(2) == ((3L, 4L, 2L, 333333L, 500000L, 0)))
    assert(r(3) == ((4L, 0L, 0L, 0L, 0L, 0)))
  }

  test("x211 gate: every corpus doc accounted, length carried exactly") {
    val rows = run("x211_char_stats").collect()
    val docs = Tables.documents(spark, sfDir)
    assert(rows.length == docs.count())
    assert(rows.forall(r => r.getLong(3) >= 0 && r.getLong(3) <= 1000000L))
    assert(rows.forall(r => r.getLong(4) >= 0 && r.getLong(4) <= 1000000L))
    // n_chars must be exactly length(text) — the explode lost nothing
    val lens = docs.select(col("doc_id"), length(col("text")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) == lens(r.getLong(0)),
      s"doc ${r.getLong(0)}: n_chars must equal length(text)"))
    assert(rows.exists(_.getLong(3) > 0), "positive control: some collision mass")
  }

  test("x212: rank intervals split exactly across a bucket boundary") {
    // freqs: x->9 (rank 1), p,q,r->2 (ranks 2-4): the f=2 interval
    // straddles bucket 1 ([2,3], 2 types) and bucket 2 ([4,7], 1 type)
    val docs = Seq((1L, ("x " * 9) + "p q"), (2L, "p q r r")).toDF("doc_id", "text")
    val r = CorpusStats.zipfProfile(docs).orderBy("bucket").collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
    assert(r.toSeq == Seq(
      (0, 1L, 1L, 9L, 600000L),    //  9/15
      (1, 2L, 2L, 4L, 866666L),    // 13/15
      (2, 4L, 1L, 2L, 1000000L)))  // 15/15 exact
  }

  test("x212 gate: type and token mass conserved; coverage monotone to exactly 1e6") {
    val rows = run("x212_zipf_profile").collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sfDir)
    val toks = docs.select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
    assert(rows.map(_.getLong(2)).sum == toks.select("tok").distinct().count(),
      "bucket type counts must sum to the exact vocabulary size")
    assert(rows.map(_.getLong(3)).sum == toks.count(),
      "bucket token mass must sum to the exact corpus token count")
    val cov = rows.map(_.getLong(4))
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b }, "coverage monotone")
    assert(cov.last == 1000000L, "full coverage is exactly 1e6 ppm")
    // rank_lo is 2^bucket
    rows.foreach(r => assert(r.getLong(1) == (1L << r.getInt(0))))
  }

  test("x213: planted shared shingle scores both members; unique docs score 0") {
    val docs = Seq(
      (1L, "a b c d"),   // shingles {a b c, b c d}; 'a b c' shared with doc 2
      (2L, "a b c x"),   // shingles {a b c, b c x}
      (3L, "p q r"),     // one unique shingle
      (4L, "t u")        // too short: no shingles
    ).toDF("doc_id", "text")
    val r = CorpusStats.dupExposure(docs).orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq(
      (1L, 2L, 1L, 500000L),
      (2L, 2L, 1L, 500000L),
      (3L, 1L, 0L, 0L),
      (4L, 0L, 0L, 0L)))
  }

  test("x214: sign-safe mean, exact variance, planted dead dim") {
    // planted: dim 1 mixes signs (pins sign·(abs div n) truncation:
    // -100000/3 must give -33333, not floor's -33334); dim 2 constant
    val e = Seq(
      (1L, Array(-0.3f, 0.5f)),
      (2L, Array(0.1f, 0.5f)),
      (3L, Array(0.1f, 0.5f))).toDF("vec_id", "embedding")
    val out = graft.sim.Similarity.dimVariance(e).orderBy("dim").collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getInt(4)))
    assert(out.toSeq == Seq(
      (1, 3L, -33333L, 35555555555L, 0),
      (2, 3L, 500000L, 0L, 1)))
  }

  test("x214 gate: dim 1's variance recomputes from raw quantized values") {
    val rows = run("x214_dim_variance").collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(3) >= 0))
    val qs = graft.Tables.embeddings(spark, sfDir)
      .select(expr("cast(round(cast(embedding[0] as double) * 1000000) as bigint)").as("q"))
      .collect().map(_.getLong(0))
    val n = qs.length.toLong
    val sq = qs.map(BigInt(_)).sum
    val sq2 = qs.map(q => BigInt(q) * q).sum
    val want = (BigInt(n) * sq2 - sq * sq) / (BigInt(n) * n)
    assert(BigInt(rows.head.getLong(3)) == want,
      "dim 1 variance must equal the exact integer form")
  }

  test("x215: planted cross/within clones land in the right scope columns") {
    val docs = Seq(
      (1L, "t one", "A"), (2L, "t one", "A"),      // within-A dup
      (3L, "t two", "A"), (4L, "t two", "B"),      // cross dup, B side
      (5L, "unique", "B")).toDF("doc_id", "text", "source")
    val r = CorpusStats.dedupScope(docs).orderBy("source").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
    assert(r.toSeq == Seq(
      ("A", 3L, 1L, 1L, 0L),
      ("B", 2L, 1L, 0L, 1L)))
  }

  test("x215 gate: the clone_src plant is fully global-dup, never within-dup") {
    val rows = run("x215_dedup_scope").collect()
    val docs = Tables.documents(spark, sfDir)
    val n25 = docs.filter(col("doc_id") % 25 === 0).count()
    val n40 = docs.filter(col("doc_id") % 40 === 0).count()
    assert(n25 > 0 && n40 > 0, "plant preconditions")
    val cs = rows.find(_.getString(0) == "clone_src").get
    assert(cs.getLong(1) == n25 && cs.getLong(2) == n25 && cs.getLong(3) == 0L
      && cs.getLong(4) == n25,
      "every clone_src doc is a global dup and no within dup")
    assert(rows.map(_.getLong(3)).sum >= n40,
      "within-source plants must register as within dups")
    rows.foreach(r => assert(r.getLong(4) >= 0, "cross_gain is never negative"))
  }

  test("x216: cut list application removes exactly the duplicated spans") {
    val docs = Seq(
      (1L, "a b c p q r"),        // shares only 'a b c' with doc 2 -> cut [1,3]
      (2L, "x y a b c u v"),      // the same shingle mid-doc -> cut [3,5]
      (3L, "z z z q"),            // intra-doc repetition is NOT duplication
      (4L, "m n o p m n o"),      // overlapping flags merge -> whole doc cut
      (5L, "m n o p m n o w")     // same span [1,7], token 8 survives
    ).toDF("doc_id", "text")
    val r = graft.dedup.Dedup.spanExcise(docs).orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq(
      (1L, "p q r", 6L, 3L),
      (2L, "x y u v", 7L, 3L),
      (3L, "z z z q", 4L, 0L),
      (4L, "", 7L, 7L),
      (5L, "w", 8L, 7L)))
  }

  test("x216 gate: token accounting conserved; some corpus spans are cut") {
    val rows = run("x216_span_excise").collect()
    val docs = Tables.documents(spark, sfDir)
    assert(rows.length == docs.count())
    rows.foreach { r =>
      val toks = if (r.getString(1).isEmpty) 0 else r.getString(1).split(" ").length
      assert(toks == r.getLong(2) - r.getLong(3),
        "clean_text token count must equal n_tokens - n_removed")
      assert(r.getLong(3) >= 0 && r.getLong(3) <= r.getLong(2))
    }
    assert(rows.exists(_.getLong(3) > 0),
      "positive control: the sf corpus has duplicated spans to cut")
  }

  test("x217: exact-rank shards fill evenly; clean_cut only on strict key breaks") {
    // keys [10,10,10,20,20,30,40,40], uid 1..8, 4 shards of 2:
    // shard 1 splits the 10-run (clean_cut 0), shard 3 starts past 30
    val df = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 4L), (20L, 5L),
      (30L, 6L), (40L, 7L), (40L, 8L)).toDF("k", "uid")
    val r = graft.util.SortedLayout
      .sortedShardAudit(df, "k", "uid", tieSpan = 100L, nShards = 4)
      .orderBy("shard_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getInt(4)))
    assert(r.toSeq == Seq(
      (0L, 2L, 10L, 10L, 1),
      (1L, 2L, 10L, 20L, 0),
      (2L, 2L, 20L, 30L, 0),
      (3L, 2L, 40L, 40L, 1)))
  }

  test("x217 gate: rows conserved, shards even, zone maps monotone") {
    val rows = run("x217_sorted_shards").collect()
    val nOrders = Tables.orders(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum == nOrders, "every order lands in a shard")
    val sizes = rows.map(_.getLong(1))
    assert(sizes.init.distinct.length == 1 && sizes.last <= sizes.head,
      "equal fill except a short final shard")
    val pairs = rows.map(r => (r.getLong(2), r.getLong(3)))
    pairs.foreach { case (lo, hi) => assert(lo <= hi, "zone map lo <= hi") }
    // rank-ordered layout: the next shard can never start BELOW the
    // previous shard's max (equal at a split key run, above otherwise)
    assert(pairs.zip(pairs.tail).forall { case ((_, hi), (lo2, _)) => lo2 >= hi },
      "shard zone maps must be rank-ordered")
  }

  test("x218: delta routes by zone-map upper bound; overflow appends to the last shard") {
    // base keys [10,10,20,20,30,30,40,40] -> 4 shards of 2:
    // maxes 10,20,30,40; delta keys probe: below-min, inside, boundary,
    // above-global-max
    val base = Seq((10L, 1L), (10L, 2L), (20L, 3L), (20L, 4L), (30L, 5L),
      (30L, 6L), (40L, 7L), (40L, 8L)).toDF("k", "uid")
    val delta = Seq(
      (5L, 11L),   // below everything -> shard 0
      (15L, 12L),  // first covering max is 20 -> shard 1
      (20L, 13L),  // equal to shard 1's max -> shard 1 (min matching)
      (99L, 14L),  // above global max -> last shard (3)
      (99L, 15L)).toDF("k", "uid")
    val r = graft.util.SortedLayout
      .shardRouting(base, delta, "k", "uid", tieSpan = 100L, nShards = 4,
        rewriteAbovePpm = 600000L)
      .orderBy("shard_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getInt(4)))
    assert(r.toSeq == Seq(
      (0L, 2L, 1L, 500000L, 0),
      (1L, 2L, 2L, 1000000L, 1),
      (2L, 2L, 0L, 0L, 0),
      (3L, 2L, 2L, 1000000L, 1)))
  }

  test("x218 gate: every delta row routed exactly once") {
    val rows = run("x218_shard_routing").collect()
    val nDelta = Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % 13 === 0).count()
    assert(rows.map(_.getLong(2)).sum == nDelta,
      "routing must be total: no delta row lost or double-counted")
    assert(rows.exists(_.getLong(2) > 0), "positive control: delta mass lands")
    rows.foreach(r => assert((r.getLong(3) > 80000L) == (r.getInt(4) == 1)))
  }

  test("x219: planted unit / short / long vectors land in the right norm buckets") {
    val e = Seq(
      (1L, Array(0.6f, 0.8f)),   // norm^2 = 1e12 exactly -> bucket 10, on-unit
      (2L, Array(0.1f, 0.1f)),   // 2e10 -> bucket 0, off
      (3L, Array(1.2f, 0.0f))    // 1.44e12 -> bucket 14, off
    ).toDF("vec_id", "embedding")
    val r = e.select(col("vec_id"),
        graft.sim.Similarity.dotFixed(col("embedding"), col("embedding")).as("nsq"))
      .withColumn("bucket", expr("nsq div 100000000000"))
      .groupBy("bucket").agg(count(lit(1)).as("n_vecs"),
        min("nsq").as("min_nsq"), max("nsq").as("max_nsq"))
      .withColumn("off_unit", (col("bucket") < 9 || col("bucket") >= 11).cast("int"))
      .orderBy("bucket").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getInt(4)))
    assert(r.toSeq == Seq(
      (0L, 1L, 20000000000L, 20000000000L, 1),
      (10L, 1L, 1000000000000L, 1000000000000L, 0),
      (14L, 1L, 1440000000000L, 1440000000000L, 1)))
  }

  test("x219 gate: every vector lands in exactly one bucket") {
    val rows = run("x219_norm_audit").collect()
    assert(rows.map(_.getLong(1)).sum ==
      graft.Tables.embeddings(spark, sfDir).count())
    rows.foreach { r =>
      val b = r.getLong(0)
      assert(r.getLong(2) >= b * 100000000000L &&
        r.getLong(3) < (b + 1) * 100000000000L, "min/max inside the bucket range")
    }
    assert(rows.nonEmpty)
  }

  test("x213 gate: exposure bounded, and the corpus carries nonzero shared mass") {
    val rows = run("x213_dup_exposure").collect()
    assert(rows.length == Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n_shared <= n_shingles")
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000L)
    }
    assert(rows.exists(_.getLong(2) > 0),
      "positive control: the sf corpus has cross-doc shingles")
  }
}
