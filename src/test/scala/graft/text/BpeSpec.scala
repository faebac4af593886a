package graft.text

import graft.SparkSpecBase

class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("pairStats counts adjacent pairs weighted by word-type frequency") {
    // words: "aa" wc=1, "ab" wc=3 (two docs, one repeat) → (a,b)=3, (a,a)=1
    val got = Bpe.pairStats(docs("aa ab ab", "ab"), topK = 10, minCount = 1)
      .as[(String, String, Long)].collect().toSeq
    assert(got === Seq(("a", "b", 3L), ("a", "a", 1L)))
  }

  test("single-character words contribute no pairs; minCount floors noise") {
    val got = Bpe.pairStats(docs("a b c xy xy zz"), topK = 10, minCount = 2)
      .as[(String, String, Long)].collect().toSeq
    // xy appears twice → (x,y)=2 survives; zz once → floored
    assert(got === Seq(("x", "y", 2L)))
  }

  test("ties order by (c1, c2) and topK truncates deterministically") {
    val got = Bpe.pairStats(docs("ab cd ef"), topK = 2, minCount = 1)
      .as[(String, String, Long)].collect().toSeq
    assert(got === Seq(("a", "b", 1L), ("c", "d", 1L)))
  }

  test("corpus row count does not change the pair table beyond linear weights") {
    // duplicating every doc doubles counts exactly (type table unchanged)
    val one = Bpe.pairStats(docs("ab ab cd"), topK = 10, minCount = 1)
      .as[(String, String, Long)].collect().map { case (a, b, c) => ((a, b), c) }.toMap
    val two = Bpe.pairStats(docs("ab ab cd", "ab ab cd"), topK = 10, minCount = 1)
      .as[(String, String, Long)].collect().map { case (a, b, c) => ((a, b), c) }.toMap
    assert(two === one.map { case (k, v) => (k, v * 2) })
  }
}
