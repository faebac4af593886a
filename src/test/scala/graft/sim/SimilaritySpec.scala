package graft.sim

import graft.SparkSpecBase
import graft.Tables
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  test("dotFixed matches hand-computed fixed-point dot product") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    val got = df.select(Similarity.dotFixed(col("a"), col("b"))).first().getLong(0)
    // (1e6*4e6 + 2e6*5e6 + 3e6*6e6) = 32e12
    assert(got === 32L * 1000000L * 1000000L)
  }

  test("x147: identity truncation gives 100% recall; prefix recall bounded by k") {
    val q = graft.queries.TrainingData.queries("x147_matryoshka")
    val rows = q(spark, sfDir).collect()
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 5))
    // sanity of the audit itself: truncating to the FULL width is the
    // identity, so every query must overlap 5/5
    val emb = Tables.embeddings(spark, sfDir)
    val full = Similarity.topK(emb, emb.filter(col("vec_id") < 5), 5).select("qid", "vb")
    val same = Similarity.topK(
      emb.withColumn("embedding", slice(col("embedding"), 1, 64)),
      emb.filter(col("vec_id") < 5).withColumn("embedding", slice(col("embedding"), 1, 64)),
      5).select("qid", "vb")
    assert(full.join(same, Seq("qid", "vb")).count() == full.count())
  }

  test("topK returns k ranked neighbours per query, self excluded, cos in [-1,1]") {
    val emb = Tables.embeddings(spark, sfDir)
    val res = Similarity.topK(emb, emb.filter(col("vec_id") < 5), 3).cache()
    assert(res.groupBy("qid").count().filter(col("count") =!= 3).count() === 0)
    assert(res.filter(col("qid") === col("vb")).count() === 0)
    assert(res.filter(abs(col("cos")) > 1.0 + 1e-9).count() === 0)
  }

  test("annTopK candidates agree with brute force on their top-1 when recalled") {
    val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 100)
    val exact = Similarity.topK(emb, emb, 1)
      .select("qid", "vb").as[(Long, Long)].collect().toMap
    val ann = Similarity.annTopK(emb, 64, 1)
      .select("qid", "vb").as[(Long, Long)].collect().toMap
    // ANN is approximate: where it returns the same neighbour id, fine;
    // overall recall on this data should be well above zero.
    val hits = ann.count { case (q, v) => exact.get(q).contains(v) }
    assert(hits > 0, s"ANN recall should be non-zero (got $hits/${ann.size})")
  }

  test("annTopKForQueries is exactly annTopK restricted to the sampled query set") {
    val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 200).cache()
    val queries = emb.filter(col("vec_id") < 7)
    // the probe-side semi-join happens BEFORE the bucket join, so it
    // must be semantics-preserving: same candidates, same re-rank, same
    // rows as the full surface filtered after the fact
    val full = Similarity.annTopK(emb, 64, 3)
      .filter(col("qid") < 7)
      .select("qid", "vb", "rank").as[(Long, Long, Int)].collect().toSet
    val restricted = Similarity.annTopKForQueries(emb, queries, 64, 3)
      .select("qid", "vb", "rank").as[(Long, Long, Int)].collect().toSet
    assert(restricted === full)
    assert(restricted.nonEmpty)
  }

  test("wider LSH bands create more buckets and prune candidates harder") {
    val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 200).cache()
    def stats(planes: Int, bands: Int): (Long, Long) = {
      val banded = Similarity.sigBands(
        Similarity.signatures(emb, 64, planes), planes, bands).cache()
      val buckets = banded.select("band_idx", "band").distinct().count()
      val a = banded.select(col("vec_id").as("qid"), col("band_idx"), col("band"))
      val b = banded.select(col("vec_id").as("vb"), col("band_idx"), col("band"))
      val cands = a.join(b, Seq("band_idx", "band"))
        .filter(col("qid") < col("vb")).select("qid", "vb").distinct().count()
      (buckets, cands)
    }
    val (narrowBuckets, narrowCands) = stats(16, 2) // two 8-bit bands
    val (wideBuckets, wideCands) = stats(32, 2)     // two 16-bit bands
    // bucket cardinality must grow with signature width — that is what
    // keeps bucket size (and the bucket self-join) bounded as n scales
    assert(wideBuckets > narrowBuckets,
      s"wide=$wideBuckets narrow=$narrowBuckets")
    assert(wideCands <= narrowCands,
      s"wide=$wideCands narrow=$narrowCands")
  }

  test("annTopKAdaptive resolves geometry from n and returns ranked neighbours") {
    val emb = Tables.embeddings(spark, sfDir)
    val res = Similarity.annTopKAdaptive(emb, 64, 3).cache()
    assert(res.count() > 0)
    assert(res.filter(col("rank") > 3).count() === 0)
    assert(res.filter(col("qid") === col("vb")).count() === 0)
  }

  test("sq8 codes are 0-255 for corpus vectors; sq8TopK with full shortlist is exactly brute force") {
    val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 100).cache()
    val codes = Similarity.sq8Codes(emb, Similarity.sq8Range(emb))
    assert(codes.filter(col("code") < 0 || col("code") > 255).count() === 0)
    val q = emb.filter(col("vec_id") < 5)
    val exact = Similarity.topK(emb, q, 3)
      .select("qid", "vb", "rank").as[(Long, Long, Int)].collect().toSet
    // shortlist ≥ corpus size → the quantized stage prunes nothing and
    // the exact re-rank must reproduce brute force bit-for-bit
    val sq = Similarity.sq8TopK(emb, q, 3, shortlist = 200)
      .select("qid", "vb", "rank").as[(Long, Long, Int)].collect().toSet
    assert(sq === exact)
  }

  test("sq8TopK with a tight shortlist still ranks k deterministic neighbours per query") {
    val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 200).cache()
    val q = emb.filter(col("vec_id") < 5)
    val res = Similarity.sq8TopK(emb, q, 3, shortlist = 10).cache()
    assert(res.groupBy("qid").count().filter(col("count") =!= 3).count() === 0)
    assert(res.filter(col("qid") === col("vb")).count() === 0)
    // repartitioned input → identical result (integer codes + id ties)
    val res2 = Similarity.sq8TopK(emb.repartition(7), q, 3, shortlist = 10)
    assert(res2.select("qid", "vb", "rank").as[(Long, Long, Int)].collect().toSet
      === res.select("qid", "vb", "rank").as[(Long, Long, Int)].collect().toSet)
  }

  test("annNearDupPairs: subset of brute-force pairs at the threshold, each ordered and above it") {
    val emb = Tables.embeddings(spark, sfDir).cache()
    val ann = Similarity.annNearDupPairs(emb, 64, 0.3).cache()
    assert(ann.filter(col("va") >= col("vb")).count() === 0)
    assert(ann.filter(col("cos") < 0.3).count() === 0)
    val annPairs = ann.select("va", "vb").as[(Long, Long)].collect().toSet
    val brute = Similarity.cosinePairs(emb, 0.3)
      .select("va", "vb").as[(Long, Long)].collect().toSet
    assert(annPairs.subsetOf(brute), "LSH candidates must never invent pairs")
    assert(annPairs.nonEmpty, "recall should be non-zero on this data")
  }

  test("adaptivePlanes keeps expected bucket size bounded as the corpus grows") {
    // pure geometry: per-band bucket count 2^w must cover n/targetBucket
    // (until the 15-bit cap), and width is monotone in n
    for (n <- Seq(100L, 1000L, 10000L, 1000000L)) {
      val w = Similarity.adaptivePlanes(n) / Similarity.NumBands
      if (w < 15) assert((1L << w) >= n / 16,
        s"n=$n w=$w: expected bucket size exceeds target")
    }
    assert(Similarity.adaptivePlanes(100) <= Similarity.adaptivePlanes(10000))
    assert(Similarity.adaptivePlanes(10000) <= Similarity.adaptivePlanes(10000000))

    // empirical: on a 10× corpus with the adaptive width, bucket count
    // grows and the max bucket (the self-join's worst key) stays small —
    // the property that bounds candidate volume at 100 TB. Synthetic
    // near-uniform embeddings, deterministic (hash-derived, no RNG).
    def synth(n: Int) = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), d =>
        ((xxhash64(concat(col("id"), lit("_"), d)) % 1000).cast("double") / 1000.0)
          .cast("float")).as("embedding"))
    def bucketStats(n: Int): (Long, Long) = {
      val planes = Similarity.adaptivePlanes(n)
      val banded = Similarity.sigBands(
        Similarity.signatures(synth(n), 64, planes), planes, Similarity.NumBands)
      val sizes = banded.groupBy("band_idx", "band").count().cache()
      (sizes.count(), sizes.agg(max("count")).first().getLong(0))
    }
    val (buckets1x, max1x) = bucketStats(300)
    val (buckets10x, max10x) = bucketStats(3000)
    assert(buckets10x > buckets1x, s"buckets: 10x=$buckets10x 1x=$buckets1x")
    assert(max10x <= 4 * 16, s"max bucket $max10x exceeds 4x targetBucket")
    assert(max1x <= 4 * 16, s"max bucket $max1x exceeds 4x targetBucket")
  }

  test("ivfTopK with nprobe = nlist is exactly brute force; fewer probes keep recall") {
    val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 200).cache()
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Similarity.topK(emb, queries, 3)
      .select("qid", "vb", "rank").as[(Long, Long, Int)].collect().toSet
    // probing every cluster must reproduce brute force bit-for-bit
    val full = Similarity.ivfTopK(emb, queries, 3, nlist = 8, nprobe = 8)
      .select("qid", "vb", "rank").as[(Long, Long, Int)].collect().toSet
    assert(full === exact)
    // partial probing returns k results per query with non-zero recall
    val part = Similarity.ivfTopK(emb, queries, 3, nlist = 8, nprobe = 2)
      .select("qid", "vb", "rank").as[(Long, Long, Int)].collect()
    assert(part.groupBy(_._1).forall(_._2.length == 3))
    assert(part.toSet.intersect(exact).nonEmpty)
  }

  test("randomProjection: outDim exact coords per vector, partition-invariant") {
    val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 50)
    def proj(parts: Int): Map[(Long, Int), Long] =
      Similarity.randomProjection(emb.repartition(parts), 64, 8)
        .as[(Long, Int, Long)].collect().map { case (v, p, x) => (v, p) -> x }.toMap
    val p1 = proj(1)
    assert(p1.size === 50 * 8)
    assert(proj(16) === p1) // integer dots: bit-identical at any parallelism
  }

  test("ivfIndex assigns every vector to exactly one of nlist clusters") {
    val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 100)
    val (_, assignments) = Similarity.ivfIndex(emb, nlist = 4, iters = 1)
    assert(assignments.count() === 100)
    assert(assignments.select("vec_id").distinct().count() === 100)
    assert(assignments.select("cluster").distinct().count() <= 4)
  }

  test("ivfIndex cache lifecycle: only the returned frames stay cached, ivfUnpersist clears them") {
    val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 100)
    spark.catalog.clearCache()
    val (centroids, assignments) = Similarity.ivfIndex(emb, nlist = 4, iters = 2)
    // the element cache is released inside the build; the two returned
    // (already-materialized) frames are the only registered caches
    assert(!spark.sharedState.cacheManager.isEmpty)
    Similarity.ivfUnpersist(centroids, assignments)
    assert(spark.sharedState.cacheManager.isEmpty,
      "index build must not leak storage beyond its returned frames")
  }

  test("blockedCosinePairs only pairs rows sharing the blocking key") {
    val emb = Tables.embeddings(spark, sfDir)
    val labels = emb.select(col("vec_id"), col("label")).as[(Long, Int)].collect().toMap
    val pairs = Similarity.blockedCosinePairs(emb, "label", 0.0)
      .select("va", "vb").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b) => labels(a) == labels(b) })
  }
}
