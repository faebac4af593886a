package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-self bigram language-model scoring — the CCNet-style
  * "perplexity against a reference model" quality signal, with the
  * corpus itself as the model (no external LM artifact, so the whole
  * computation is reproducible from the data alone).
  *
  * Per document: mean over its bigram occurrences of the add-one-
  * smoothed corpus transition probability
  * p(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + V), V = distinct next-token
  * types, kept float-free as parts-per-million integers (integer
  * division, so DuckDB resolves bit-identical scores). The smoothing is
  * load-bearing for a SELF-trained model: unsmoothed MLE hands every
  * singleton context probability 1, so pure gibberish (all-unique
  * vocabulary) would score perfectly — smoothed, singleton contexts
  * divide by ~V and gibberish sinks (spec-pinned). V resolves from the
  * data as a broadcast 1-row aggregate, the x32/x39 discipline, so the
  * oracle resolves the same constant from its own count. Low score ⇒
  * improbable transitions — gibberish, wrong-language fragments,
  * shredded markup; high score ⇒ boilerplate-like text (which is why it
  * pairs with the novelty / repetition signals rather than replacing
  * them).
  *
  * Shuffle structure, sized for 100 TB:
  *  - occurrences collapse to (doc, w1, w2, k) FIRST — one
  *    map-side-combined shuffle; every later stage works on doc-distinct
  *    bigrams, never raw occurrences, so stop-bigram skew ("of the"…)
  *    concentrates counts, not rows.
  *  - the model (bigram → count) is another map-combined aggregate of
  *    that table, and the prefix counts c(w1 ·) are an aggregate OF THE
  *    MODEL (vocabulary-sized, not corpus-sized).
  *  - scoring joins doc-bigrams to the model on (w1, w2) — an equi-join
  *    between two doc-distinct-sized tables (SMJ at scale), then one
  *    groupBy(doc) aggregate.
  * Nothing corpus-sized is ever broadcast, windowed, or collected.
  */
object BigramLm {

  /** (doc_id, w1, w2, k): per-document bigram occurrence counts. The
    * token array materializes as a named column first (the docShingles
    * lesson — a lambda over an inlined regex split re-runs the split per
    * element); the bigram structs are cheap bound-reference indexing. */
  def docBigrams(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("t")) - 1),
        i => struct(element_at(col("t"), i).as("w1"), element_at(col("t"), i + 1).as("w2"))))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("k"))

  /** Corpus collocation mining by PMI lift — the phrase detector of
    * corpus analysis ("New York", "prime minister"): bigrams whose
    * observed count beats the independence expectation c1·c2/N. The
    * integer lift c12·N/(c1·c2) is a strictly monotone transform of
    * PMI = log of the same ratio, so ranking by lift ≡ ranking by PMI
    * with zero transcendental ops — the score stays bit-identical in
    * any engine. `minCount` floors c12 (singleton bigrams have huge
    * noisy lift); association ordering: the c12/c1 ratio resolves to
    * ppm FIRST, then scales by N and divides by c2 — all integer
    * `div`, worst intermediate ≤ 10⁶·N (fits a long to N ≈ 9·10¹²
    * bigram occurrences; beyond that, shard the corpus).
    *
    * Shuffle structure: the model is one map-combined aggregate of
    * [[docBigrams]]'s per-doc counts; marginals c1/c2 and N are
    * aggregates OF the model (vocab²-bounded, cached — never a second
    * corpus scan); top-k is TakeOrderedAndProject with total
    * tie-breaking, so the cut is deterministic. */
  def collocations(docs: DataFrame, minCount: Long, topK: Int,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // EAGER materialization (r16; was a lazy .cache()): the model feeds
    // the two marginal aggregates, the total, and the filtered probe —
    // built as concurrent broadcast jobs that race a lazy cache into
    // rebuilding the same corpus-scan plan (the r15 minhashNearDups
    // finding). The model is vocab²-bounded metadata, never corpus-sized.
    val model = docBigrams(docs, idCol, textCol)
      .groupBy("w1", "w2").agg(sum("k").as("c12")).localCheckpoint(true)
    val left = model.groupBy("w1").agg(sum("c12").as("c1"))
    val right = model.groupBy("w2").agg(sum("c12").as("c2"))
    val nb = model.agg(sum("c12").as("nb"))
    model.filter(col("c12") >= minCount)
      .join(left, Seq("w1")).join(right, Seq("w2"))
      .crossJoin(broadcast(nb))
      .select(col("w1"), col("w2"), col("c12"),
        expr("((c12 * 1000000 div c1) * nb) div c2").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Per-document LM score: (doc_id, n_bigrams, lm_score_ppm), one row
    * per input document (docs too short to form a bigram score 0). */
  def scoreDocs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // EAGER shared planes (r16; previously UNmaterialized): docbg feeds
    // the model chain AND the per-doc probe join (the tokenize+explode
    // corpus pass ran twice per run), and the model feeds prefix, vocab
    // and the probs join (three more aggregations of docbg without the
    // cut). docbg is per-doc bigram counts; the model is vocab²-bounded.
    val docbg = docBigrams(docs, idCol, textCol).localCheckpoint(true)
    val model = docbg.groupBy("w1", "w2").agg(sum("k").as("cb")).localCheckpoint(true)
    val prefix = model.groupBy("w1").agg(sum("cb").as("cp"))
    val vocab = model.select("w2").distinct().agg(count(lit(1)).as("v"))
    val probs = model.join(prefix, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"),
        expr("(cb + 1) * 1000000 div (cp + v)").as("p_ppm"))
    val perDoc = docbg.join(probs, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(sum("k").as("n_bigrams"), sum(col("k") * col("p_ppm")).as("sum_ppm"))
    docs.select(col(idCol).as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(expr("sum_ppm div n_bigrams"), lit(0L)).as("lm_score_ppm"))
  }
}
