package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE tokenizer-training preparation: adjacent-symbol pair statistics
  * over the word-type frequency dictionary — the count table whose
  * argmax is the first merge of byte-pair encoding (Sennrich et al.
  * 2016). Training a tokenizer at corpus scale starts exactly here, and
  * the classic trick that makes it tractable is encoded in the plan
  * shape: the CORPUS collapses to the word-TYPE dictionary first (one
  * map-side-combined aggregate to vocabulary-sized data), and all
  * per-character work happens on word types weighted by their counts —
  * so the expensive stage is vocabulary-sized, independent of corpus
  * row count. (The end-of-word sentinel of the original formulation is
  * a constant-cardinality column variant; omitted here so symbols stay
  * single characters.)
  *
  * Shuffle structure: one shuffle on the word (map-combined — stop
  * words concentrate counts, not rows), then the pair explode and the
  * (c1, c2) aggregate both run over Σ|word| rows of the VOCABULARY,
  * bounded at any corpus size; top-k is TakeOrderedAndProject with
  * full-column tie-breaks. All counts integer — bit-identical in any
  * engine.
  */
object Bpe {

  /** The iterated BPE TRAINING loop (the merges file a tokenizer ships):
    * `rounds` greedy merge rounds over the word-type dictionary,
    * returning one row per round — (round, p1, p2, pair_count), the
    * winning pair and its frequency-weighted count at selection time.
    *
    * Relational loop, the x16/x62 k-means shape: every round is (a) one
    * vocabulary-sized pair aggregate, (b) a 1-ROW driver collect of the
    * argmax pair (bounded index metadata — the ivfIndex discipline;
    * ties break count DESC, p1, p2), (c) a vocabulary-sized greedy
    * left-to-right merge fold over each word's symbol array (a CASE'd
    * `aggregate` HOF — interpreted, but over WORD TYPES, never the
    * corpus; the merged token naturally blocks re-merging with the next
    * symbol because the fold compares token strings, so runs merge
    * exactly like classic BPE: "a a a a" + (a,a) → "aa aa"). Each
    * round's state is cached and the previous round dropped, so round r
    * is one job over round r−1, not a re-derivation from the corpus.
    * The corpus is touched exactly once (the word-type collapse). */
  def merges(docs: DataFrame, rounds: Int, textCol: String = "text"): DataFrame = {
    val sp = docs.sparkSession
    val (table, state) = trainLoop(docs, rounds, textCol)
    state.unpersist()
    import sp.implicits._
    table.toDF("round", "p1", "p2", "pair_count")
  }

  /** The trained tokenizer APPLIED: per document, word and BPE-token
    * counts under the vocabulary [[merges]] produces after `rounds`
    * rounds — the fertility audit (tokens per word) every tokenizer
    * change is judged by before a corpus is re-encoded.
    *
    * Encoding is resolved on the word-TYPE dictionary (each type's
    * symbol array already IS its encoding — the same collapse as
    * training), so per-document work is one join from the corpus's
    * word occurrences to a vocab-sized (word → n_tokens) table and a
    * groupBy(doc): the corpus never sees the merge fold. */
  def fertility(docs: DataFrame, rounds: Int, textCol: String = "text"): DataFrame = {
    val occurrences = docs
      .select(col("doc_id"), explode(TextFunctions.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) >= 1)
    val state = trainLoop(docs, rounds, textCol)._2
    val encoded = state.select(col("word"), size(col("sym")).as("n_tok"))
    // note: state stays cached for the consumer's evaluation (the x57
    // scored-frame convention); it is vocab-sized
    occurrences.join(encoded, Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_tok").as("n_bpe_tokens"))
  }

  /** The shared training loop: returns the merge table rows AND the
    * final cached (word, wc, sym) vocabulary state (caller unpersists).
    * Every round is one vocab-sized pair aggregate, a 1-row argmax
    * collect, and a vocab-sized merge fold; state is cached per round
    * with the previous round dropped (the x16 k-means lineage cut). */
  private def trainLoop(docs: DataFrame, rounds: Int, textCol: String)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    val sp = docs.sparkSession
    import sp.implicits._
    var state = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy("word").agg(count(lit(1)).as("wc"))
      .select(col("word"), col("wc"), split(col("word"), "").as("sym"))
      .cache()
    state.count()
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val top = state
        .filter(size(col("sym")) >= 2)
        .select(col("wc"), explode(transform(
          sequence(lit(1), size(col("sym")) - 1),
          i => struct(element_at(col("sym"), i).as("a"),
            element_at(col("sym"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b")).agg(sum("wc").as("c"))
        .orderBy(desc("c"), col("a"), col("b")).limit(1)
        .as[(String, String, Long)].collect()
      top.headOption.foreach { case (a, b, c) =>
        out += ((r, a, b, c))
        val folded = aggregate(col("sym"),
          array().cast("array<string>"),
          (acc, x) => when(size(acc) > 0 &&
              element_at(acc, size(acc)) === lit(a) && x === lit(b),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
            .otherwise(concat(acc, array(x))))
        val next = state.select(col("word"), col("wc"), folded.as("sym")).cache()
        next.count()
        state.unpersist()
        state = next
      }
    }
    (out.result(), state)
  }

  /** (c1, c2, pair_count): the `topK` most frequent adjacent character
    * pairs across word types, each occurrence weighted by the word's
    * corpus frequency; pairs below `minCount` are noise-floored away. */
  def pairStats(docs: DataFrame, topK: Int, minCount: Long,
                textCol: String = "text"): DataFrame = {
    val words = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("wc"))
    words
      .select(col("word"), col("wc"),
        explode(sequence(lit(1), length(col("word")) - 1)).as("i"))
      .select(col("word").substr(col("i"), lit(1)).as("c1"),
        col("word").substr(col("i") + 1, lit(1)).as("c2"),
        col("wc"))
      .groupBy("c1", "c2").agg(sum(col("wc")).as("pair_count"))
      .filter(col("pair_count") >= minCount)
      .orderBy(desc("pair_count"), col("c1"), col("c2"))
      .limit(topK)
  }
}
