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
