package graft.dedup

import graft.SparkSpecBase
import graft.Tables
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpecBase {
  private lazy val docs = Tables.documents(spark, sfDir).cache()

  test("exactDedup keeps one row per fingerprint and is idempotent") {
    val once = Dedup.exactDedup(docs)
    val twice = Dedup.exactDedup(once)
    assert(once.count() === Dedup.exactGroups(docs).count())
    assert(twice.count() === once.count())
  }

  test("exactGroups keeper is the minimum doc_id of its group") {
    val g = Dedup.exactGroups(docs)
    // every keeper must exist in docs and group sizes sum to the row count
    assert(g.agg(sum("n_copies")).first().getLong(0) === docs.count())
    assert(g.join(docs, g("keeper_id") === docs("doc_id"), "left_anti").count() === 0)
  }

  test("minhash LSH finds the same >=0.5 near-dup pairs as exact jaccard") {
    val exact = Dedup.jaccardPairs(Dedup.docShingles(docs), 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashNearDups(docs, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // verification step makes LSH ⊆ exact; 16 bands × 2 rows at j≈0.99 ⇒ full recall here
    assert(lsh === exact)
    assert(exact.nonEmpty, "test data should contain planted near-dups")
  }

  test("nearDupsAfterExact on a duplicated corpus equals minhashNearDups on the originals") {
    // replicate every document under fresh ids: exact dedup must
    // collapse the copies back to the original keepers, so the composed
    // pipeline's near-dup pairs are EXACTLY the originals' pairs —
    // duplication changes the cost, never the answer
    val copies = docs.withColumn("doc_id", col("doc_id") + lit(10000000L))
    val duplicated = docs.unionByName(copies)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(Dedup.nearDupsAfterExact(duplicated, 0.5)) ===
      pairs(Dedup.minhashNearDups(docs, 0.5)))
  }

  test("delta dedup equals the cross-split slice of the full pipeline, new side first") {
    val split = 250L
    val newDocs = docs.filter(col("doc_id") >= split)
    val corpus = docs.filter(col("doc_id") < split)
    val delta = Dedup.minhashNearDupsDelta(newDocs, corpus, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // full pipeline emits doc_a < doc_b; the cross-split slice oriented
    // (new, corpus) must match exactly — no corpus-internal or
    // batch-internal pair may appear, none may be missed
    val full = Dedup.minhashNearDups(docs, 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a < split) != (b < split) }
      .map { case (a, b) => if (a >= split) (a, b) else (b, a) }.toSet
    assert(delta === full)
    assert(delta.forall { case (a, b) => a >= split && b < split })
  }

  test("simhash near-dups recall most jaccard near-dups and respect the hamming bound") {
    val simDf = Dedup.simhashNearDups(Dedup.simhashMd5(docs), maxHamming = 3, sigBits = 32).cache()
    assert(simDf.filter(col("hamming") > 3).count() === 0)
    val sim = simDf.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.jaccardPairs(Dedup.docShingles(docs), 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // SimHash is approximate: near-identical token sets usually land within
    // hamming 3, but a few token edits can flip more than 3 of 32 bits.
    val recalled = exact.count(sim.contains)
    assert(recalled * 2 >= exact.size, s"recall $recalled/${exact.size} below 50%")
  }

  test("df-capped candidate generation keeps the planted near-dup pairs") {
    val sh = Dedup.docShingles(docs).cache()
    val full = Dedup.jaccardPairs(sh, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.jaccardPairs(Dedup.dropStopShingles(sh, 20), 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full.nonEmpty)
    // near-dups share many rare shingles: dropping high-df shingles
    // shrinks intersection and union together, so every true pair survives
    assert(full.subsetOf(capped), s"capped lost ${full.diff(capped)}")
  }

  test("winnowing emits at most one fingerprint per shingle and is deterministic") {
    val fp1 = Dedup.winnowFingerprints(docs).count()
    val fp2 = Dedup.winnowFingerprints(docs).count()
    val nShingles = Dedup.docShingles(docs).count()
    assert(fp1 === fp2)
    assert(fp1 <= nShingles)
    assert(fp1 > 0)
  }

  test("winnow fingerprint overlap flags a planted verbatim run and ignores disjoint text") {
    import spark.implicits._
    val shared = (1 to 30).map(i => s"tok$i").mkString(" ")
    val planted = Seq(
      (1L, s"$shared trailing words here"),      // long shared run with doc 3
      (2L, "completely different vocabulary with no overlap at all whatsoever"),
      (3L, s"leading words then $shared"))
      .toDF("doc_id", "text")
    val fp = Dedup.winnowFingerprints(planted)
    val shared13 = fp.filter(col("doc_id") === 1).select("fp")
      .intersect(fp.filter(col("doc_id") === 3).select("fp")).count()
    val shared12 = fp.filter(col("doc_id") === 1).select("fp")
      .intersect(fp.filter(col("doc_id") === 2).select("fp")).count()
    // winnowing guarantees a shared fingerprint for any common run of
    // ≥ w+n−1 = 6 tokens; a 30-token run leaves well over the ≥2 bar
    assert(shared13 >= 2, s"planted run shares only $shared13 fingerprints")
    assert(shared12 === 0)
  }

  test("component-keyed split assignment never separates a near-dup pair") {
    val pairs = Dedup.minhashNearDups(docs, 0.5).select("doc_a", "doc_b").cache()
    val labels = Dedup.nearDupComponents(pairs, docs)
    val b = graft.util.Sampling.hashBucket(col("component"))
    val assign = labels.select(col("doc_id"),
      when(b < 205, "train").when(b < 230, "val").otherwise("test").as("split"))
    val crossing = pairs
      .join(assign.select(col("doc_id").as("doc_a"), col("split").as("split_a")), Seq("doc_a"))
      .join(assign.select(col("doc_id").as("doc_b"), col("split").as("split_b")), Seq("doc_b"))
      .filter(col("split_a") =!= col("split_b"))
    assert(pairs.count() > 0)
    assert(crossing.count() === 0)
  }

  test("componentKeepers picks the longest member per component, min id on ties") {
    val labels = Dedup.nearDupComponents(Dedup.minhashNearDups(docs, 0.5), docs)
    val scored = docs.select(col("doc_id"), length(col("text")).as("len"))
    val out = Dedup.componentKeepers(labels, scored, "len").cache()
    // exactly one keeper per component, and the keeper is a member
    val perComp = out.groupBy("component")
      .agg(sum("is_keeper").as("nk"), countDistinct("keeper_id").as("nid"))
    assert(perComp.filter(col("nk") =!= 1 || col("nid") =!= 1).count() === 0)
    // no member outscores its keeper; equal-score members have larger ids
    val joined = out.join(scored, "doc_id")
      .join(scored.select(col("doc_id").as("keeper_id"), col("len").as("klen")), "keeper_id")
    assert(joined.filter(col("len") > col("klen")).count() === 0)
    assert(joined.filter(col("len") === col("klen") && col("doc_id") < col("keeper_id"))
      .count() === 0)
    assert(out.count() === docs.count())
  }

  test("fixpoint components merge a chain a fixed 2-hop pass cannot") {
    import spark.implicits._
    // a 6-node path graph: min-label propagation moves the root label
    // one hop per iteration, so diameter 5 needs 5 hops + 1 to detect
    // convergence — far past the fixed default
    val chainDocs = (1L to 6L).toDF("doc_id")
    val chainPairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("doc_a", "doc_b").withColumn("jaccard", lit(1.0))
    val fixed = Dedup.nearDupComponents(chainPairs, chainDocs, iters = 2)
    val fp = Dedup.nearDupComponentsFixpoint(chainPairs, chainDocs)
    assert(fp.select("component").distinct().count() === 1,
      "fixpoint must merge the whole chain into one component")
    assert(fp.filter(col("is_keeper") === 1).count() === 1)
    assert(fixed.select("component").distinct().count() > 1,
      "a 2-hop pass under-merges a diameter-5 chain (why fixpoint exists)")
    // fixpoint agrees with the fixed pass on the gate corpus (its
    // clique-shaped components converge within 2 hops)
    val corpusPairs = Dedup.minhashNearDups(docs, 0.5)
    val a = Dedup.nearDupComponents(corpusPairs, docs).collect().map(_.mkString("|")).toSet
    val b = Dedup.nearDupComponentsFixpoint(corpusPairs, docs).collect().map(_.mkString("|")).toSet
    assert(a === b)
  }
}
