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

  test("merges reproduces the hand-computed classic BPE rounds") {
    // low×5, lower×2, newest×6, widest×3 (Sennrich example, no </w>):
    // r1 (e,s)=9 tie-beats (s,t)=9 on p1; r2 (es,t)=9; r3 (l,o)=7
    // tie-beats (o,w)=7; r4 (lo,w)=7 — each round's counts reflect the
    // previous round's merges (e.g. (w,e) drops 8→2 once 'es' forms)
    val corpus = docs(
      ("low " * 5) + ("lower " * 2),
      ("newest " * 6).trim,
      ("widest " * 3).trim)
    val got = Bpe.merges(corpus, rounds = 4)
      .orderBy("round").as[(Int, String, String, Long)].collect().toSeq
    assert(got === Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L), (4, "lo", "w", 7L)))
  }

  test("merges handles runs with greedy left-to-right semantics: aaaa + (a,a) -> [aa, aa]") {
    val got = Bpe.merges(docs("aaaa"), rounds = 2)
      .orderBy("round").as[(Int, String, String, Long)].collect().toSeq
    // round 1: 3 adjacent (a,a) pairs counted, then the greedy fold
    // leaves exactly [aa, aa] — so round 2's winner is (aa,aa)×1
    assert(got === Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)))
  }

  test("fertility applies the trained vocab: hand-computed token counts per doc") {
    // after the 4 classic rounds (r4 merges (lo,w)): low→[low]=1,
    // lower→[low,e,r]=3, newest→[n,e,w,est]=4, widest→[w,i,d,est]=4
    val corpus = docs(
      ("low " * 5) + ("lower " * 2),
      ("newest " * 6).trim,
      ("widest " * 3).trim)
    val got = Bpe.fertility(corpus, rounds = 4)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (0L, 7L, 5L * 1 + 2L * 3), // 5 low + 2 lower
      (1L, 6L, 6L * 4),
      (2L, 3L, 3L * 4)))
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
