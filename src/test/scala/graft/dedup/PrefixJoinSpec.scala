package graft.dedup

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Pins for the AllPairs/PPJoin prefix-filtered Jaccard join (x81).
  * The oracle hash-gate proves output ≡ the naive full-index join;
  * these pin the two claims the gate can't see: candidate generation
  * is a SUBSET of the full inverted index's (the reduction is real and
  * measured), and a planted corpus-wide hot shingle falls out of every
  * prefix without losing the true pair it rides on. */
class PrefixJoinSpec extends SparkSpecBase {
  private lazy val docs = Tables.documents(spark, sfDir).cache()
  private lazy val sh = Dedup.docShingles(docs).cache()

  test("prefix join output equals the naive inverted-index join exactly") {
    val naive = Dedup.jaccardPairs(sh, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pp = Dedup.prefixJaccardPairs(sh, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pp === naive)
    assert(naive.nonEmpty, "test data should contain planted near-dups")
  }

  test("prefix candidates are a strict subset of the full index's candidates") {
    val full = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pref = Dedup.prefixCandidates(sh, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pref.subsetOf(full))
    // the reduction is the operator's reason to exist — require a real
    // cut, not a no-op (sf0.001 measures ~an order of magnitude)
    assert(pref.size < full.size,
      s"prefix filter produced no reduction: ${pref.size} vs ${full.size}")
    info(s"candidates: full-index ${full.size} -> prefix ${pref.size} " +
      f"(${100.0 * pref.size / full.size}%.1f%%)")
  }

  test("a planted corpus-wide hot shingle indexes into no prefix, yet its pair survives") {
    import spark.implicits._
    // every doc shares the hot 3-gram "zz zz zz"; docs 1/2 are true
    // near-dups, doc 3+ unrelated — under df-ascending canonical order
    // the hot shingle ranks last everywhere and must leave every prefix
    val base = Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta zz zz zz",
      2L -> "alpha beta gamma delta epsilon zeta eta iota zz zz zz") ++
      (3L to 12L).map(i => i -> s"unique$i only$i words$i here$i now$i zz zz zz")
    val planted = base.toDF("doc_id", "text")
    val psh = Dedup.docShingles(planted).cache()
    // the hot shingle has df = 12; no doc has a prefix long enough to
    // reach rank 12-ties territory, so it appears in zero prefix rows
    val prefixRows = {
      val sizes = psh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val dfTab = psh.groupBy("sh").agg(count(lit(1)).as("df"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("df"), col("sh"))
      psh.join(dfTab, Seq("sh")).join(sizes, Seq("doc_id"))
        .withColumn("r", row_number().over(w))
        .filter(col("r") <= col("n") - ceil(lit(0.5) * col("n")) + 1)
    }
    assert(prefixRows.filter(col("sh") === "zz zz zz").count() === 0,
      "corpus-wide shingle must sort out of every prefix")
    // and the true pair (1,2) still comes out, with nothing spurious
    val pairs = Dedup.prefixJaccardPairs(psh, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = Dedup.jaccardPairs(psh, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === naive)
    assert(pairs.contains((1L, 2L)))
  }
}
