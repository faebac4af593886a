package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** Hybrid (lexical + vector) retrieval with reciprocal-rank fusion —
  * the two-tower curation/retrieval shape: a keyword index and an
  * embedding index each produce a top-k list per query, and RRF merges
  * them without any score calibration between the two spaces (ranks
  * are the only common currency; Cormack/Clarke/Buettcher SIGIR'09).
  *
  * Everything is rank-and-integer arithmetic: the fused score is
  * Σ 10⁶ div (k₀ + rank) — float-free, so the DuckDB oracle reproduces
  * the fusion bit-for-bit.
  *
  * Scale shape: the lexical side is a df-capped inverted-index join
  * (the X24 discipline — a stop token shared by k docs contributes k²
  * candidate rows, so the cap bounds the join's worst key); both sides
  * end in per-query top-k windows keyed by qid (bounded by the query
  * set, never the corpus), and fusion joins two (queries × k)-sized
  * rank lists — corpus-sized data never reaches the fusion stage. */
object Hybrid {

  /** RRF constant k₀ — the standard 60 from the original paper. */
  val RrfK = 60

  /** Lexical top-k per query: overlap count of distinct tokens between
    * each query doc (rows matching `queryPred`) and every candidate doc
    * sharing at least one sub-cap token. Returns (qid, cand, overlap,
    * rank) with rank ties broken by ascending candidate id. */
  def lexicalTopK(docs: DataFrame, queryPred: Column, k: Int, dfCap: Int): DataFrame = {
    val dtok = docs.select(col("doc_id"),
      explode(array_distinct(TextFunctions.tokens(col("text")))).as("tok"))
    val keep = dtok.groupBy("tok").agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap).select("tok")
    val idx = dtok.join(keep, Seq("tok"), "left_semi")
    val qtok = idx.filter(queryPred).select(col("doc_id").as("qid"), col("tok"))
    val overlap = qtok.join(idx, Seq("tok"))
      .filter(col("qid") =!= col("doc_id"))
      .groupBy("qid", "doc_id").agg(count(lit(1)).as("overlap"))
    overlap
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(desc("overlap"), col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("doc_id").as("cand"), col("overlap"), col("rank"))
  }

  /** Fuse two (qid, cand, rank) lists by reciprocal-rank fusion and
    * keep the top `k` fused candidates per query. Candidates absent
    * from one list contribute 0 from that list (rank surfaces as 0). */
  def rrfFuse(lexRanks: DataFrame, vecRanks: DataFrame, k: Int, rrfK: Int = RrfK): DataFrame = {
    val l = lexRanks.select(col("qid"), col("cand"), col("rank").as("lex_rank"))
    val v = vecRanks.select(col("qid"), col("cand"), col("rank").as("vec_rank"))
    val fused = l.join(v, Seq("qid", "cand"), "full_outer")
      .select(col("qid"), col("cand"),
        coalesce(col("lex_rank"), lit(0)).as("lex_rank"),
        coalesce(col("vec_rank"), lit(0)).as("vec_rank"))
      .withColumn("rrf",
        when(col("lex_rank") > 0, expr(s"1000000 div ($rrfK + lex_rank)")).otherwise(lit(0L)) +
        when(col("vec_rank") > 0, expr(s"1000000 div ($rrfK + vec_rank)")).otherwise(lit(0L)))
    fused
      .withColumn("final_rank", row_number().over(
        Window.partitionBy("qid").orderBy(desc("rrf"), col("cand"))))
      .filter(col("final_rank") <= k)
  }
}
