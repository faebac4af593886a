package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-health statistics for the curation plane: character-level
  * diversity (the exact-integer stand-in for a character-entropy
  * gibberish filter), the Zipf rank-bucket profile of the token
  * frequency distribution, and per-document duplicated-shingle
  * exposure. Reference scope: the quality-audit role of
  * `quality_checks.py` (`quality_checks.py:20-56` profiles volume /
  * uniqueness / nulls; these are the same pre-training reads at the
  * character, vocabulary and n-gram grains the reference never had).
  *
  * Everything here is EXACT integer arithmetic (counts, ppm via
  * decimal-widened floor division) — no log/exp, so the DuckDB oracle
  * reproduces every value bit-for-bit. A Shannon entropy would need
  * `ln`, whose last-ulp behavior differs across libm implementations;
  * the collision rate Σc·(c−1)/(N·(N−1)) (Simpson repeat-rate, the
  * standard exact diversity surrogate) carries the same signal —
  * gibberish like "aaaa…" saturates at 10⁶ ppm, diverse text sits low.
  */
object CorpusStats {

  /** Per-document character diversity audit: length, distinct-char
    * count, collision rate (ppm probability two uniformly drawn
    * characters match), top-character share (ppm), and the keep
    * verdict low-diversity filters act on.
    *
    * Scale shape: the per-character explode never reaches the shuffle
    * at character volume — `groupBy(doc_id, ch)` partial-aggregates to
    * at most |alphabet| rows per document per task before exchanging,
    * so shuffle bytes are alphabet-bounded per doc, not length-bounded.
    * One exchange on doc_id after that; everything else is a map.
    */
  def charStats(docs: DataFrame,
                minDistinct: Int = 5,
                maxCollisionPpm: Long = 250000L): DataFrame = {
    val per = docs
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .filter(length(col("ch")) > 0)
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
    val agg = per.groupBy("doc_id").agg(
      sum("c").as("n"),
      count(lit(1)).as("n_distinct"),
      sum(col("c") * (col("c") - 1)).as("coll"),
      max("c").as("topc"))
    docs.select("doc_id").join(agg, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n"), lit(0L)).as("n_chars"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct_chars"),
        when(col("n") >= 2,
          expr("CAST(coll AS DECIMAL(38,0)) * 1000000 div (n * (n - 1))"))
          .otherwise(lit(0L)).as("collision_ppm"),
        when(col("n") >= 1,
          expr("CAST(topc AS DECIMAL(38,0)) * 1000000 div n"))
          .otherwise(lit(0L)).as("top_char_ppm"))
      .withColumn("keep",
        (col("n_distinct_chars") >= minDistinct &&
          col("collision_ppm") < maxCollisionPpm).cast("int"))
  }

  /** Zipf rank-bucket profile of the corpus token-frequency
    * distribution: types bucketed by power-of-2 frequency RANK
    * (bucket b covers ranks [2^b, 2^(b+1)−1]), with per-bucket type
    * count, token mass, and cumulative coverage ppm — the exact,
    * discrete form of the log-log Zipf fit (a healthy natural-language
    * corpus shows roughly constant per-bucket mass; template spam
    * piles mass into the head buckets) and simultaneously the
    * vocabulary-sizing coverage curve (how much of the corpus the top
    * 2^b types explain) read before fixing a tokenizer vocab.
    *
    * Scale shape: no per-type rank is ever computed. The corpus-sized
    * work is ONE `groupBy(token)`; the frequency histogram
    * `(f, m = #types at f)` that follows is statistics-sized (distinct
    * frequency VALUES, not types), so the unpartitioned rank-interval
    * window and the ≤64-bucket interval split ride metadata — the x118
    * histogram-refinement discipline. Rank intervals come from the
    * cumulative type count ordered by f DESC (f unique after the
    * group), split exactly across bucket boundaries by overlap
    * arithmetic.
    */
  def zipfProfile(docs: DataFrame, maxBucket: Int = 39): DataFrame = {
    val tf = docs
      .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok").agg(count(lit(1)).as("f"))
    val ff = tf.groupBy("f").agg(count(lit(1)).as("m"))
    // metadata-sized from here on (distinct frequency values)
    val w = Window.orderBy(col("f").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val iv = ff.withColumn("hi_rank", sum("m").over(w))
      .withColumn("lo_rank", col("hi_rank") - col("m") + 1)
    val b = iv
      .select(col("f"), col("lo_rank"), col("hi_rank"),
        explode(sequence(lit(0), lit(maxBucket))).as("bucket"))
      .withColumn("blo", expr("shiftleft(CAST(1 AS BIGINT), bucket)"))
      .withColumn("bhi", expr("shiftleft(CAST(1 AS BIGINT), bucket + 1) - 1"))
      .withColumn("ov", least(col("hi_rank"), col("bhi"))
        - greatest(col("lo_rank"), col("blo")) + 1)
      .filter(col("ov") > 0)
    val per = b.groupBy("bucket").agg(
      sum("ov").as("n_types"),
      sum(col("ov") * col("f")).as("sum_tokens"))
    val wc = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per.withColumn("cum", sum("sum_tokens").over(wc))
      .crossJoin(broadcast(per.agg(sum("sum_tokens").as("grand"))))
      .select(
        col("bucket"),
        expr("shiftleft(CAST(1 AS BIGINT), bucket)").as("rank_lo"),
        col("n_types"), col("sum_tokens"),
        expr("CAST(cum AS DECIMAL(38,0)) * 1000000 div grand").as("coverage_ppm"))
  }

  /** Dedup scope audit: per source, how many exact duplicates a GLOBAL
    * dedup pass removes vs a per-source pass (FineWeb's
    * per-snapshot-vs-global question as an audit). Keeper = min doc_id
    * at each scope over the normalized fingerprint; `cross_gain` =
    * docs only the global pass catches. Two fingerprint-keyed
    * map-combined aggregates + one source roll-up; no pair set ever
    * materializes, so a k-clone group costs k rows. Input needs
    * (doc_id, source, text). */
  def dedupScope(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("source"),
      TextFunctions.fingerprint(col("text")).as("fp"))
    val g = base.groupBy("fp").agg(min("doc_id").as("g_keeper"))
    val w = base.groupBy("fp", "source").agg(min("doc_id").as("s_keeper"))
    base.join(g, Seq("fp")).join(w, Seq("fp", "source"))
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum((col("doc_id") =!= col("g_keeper")).cast("long")).as("dup_global"),
        sum((col("doc_id") =!= col("s_keeper")).cast("long")).as("dup_within"))
      .withColumn("cross_gain", col("dup_global") - col("dup_within"))
  }

  /** Per-document duplicated-shingle exposure: the fraction (ppm) of a
    * document's distinct 3-gram shingles that also occur in at least
    * `minDf − 1` OTHER documents — the memorization-risk score of one
    * document against the whole corpus. The per-doc scalar complement
    * of the pairwise planes: x60 localizes shared spans per PAIR, x40
    * rewrites text; this ranks documents by how much of them is
    * corpus-duplicated (boilerplate-heavy docs float to the top even
    * when no single partner crosses a near-dup threshold).
    *
    * Scale shape: one exchange on the shingle key (doc-frequency), one
    * on doc_id (the roll-up) — both map-side combined; no pair set is
    * ever materialized, so a shingle shared by k docs costs k rows,
    * not k². */
  def dupExposure(docs: DataFrame, minDf: Int = 2): DataFrame = {
    val sh = graft.util.ScanTuning.ensureParallelism(docs, col("doc_id"))
      .select(col("doc_id"),
        explode(TextFunctions.shingles(TextFunctions.tokens(col("text")))).as("sh"))
      .distinct()
      // df aggregate + the roll-up join both read the plane (x40
      // discipline) — materialized EAGERLY: the two consumers launch as
      // concurrent subtree jobs and race a lazy cache (the
      // minhashNearDups lesson)
      .localCheckpoint(true)
    val df = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    val per = sh.join(df, Seq("sh"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_shingles"),
        sum((col("df") >= minDf).cast("long")).as("n_shared"))
    docs.select("doc_id").join(per, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        when(col("n_shingles") >= 1,
          expr("CAST(n_shared AS DECIMAL(38,0)) * 1000000 div n_shingles"))
          .otherwise(lit(0L)).as("shared_ppm"))
  }
}
