package graft.text

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class BigramLmSpec extends SparkSpecBase {

  import spark.implicits._

  private def score(docs: Seq[(Long, String)]): Map[Long, (Long, Long)] =
    BigramLm.scoreDocs(docs.toDF("doc_id", "text"))
      .select("doc_id", "n_bigrams", "lm_score_ppm")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("hand-computed smoothed transition probabilities in ppm") {
    // corpus: c(x y)=1, c(x z)=1, c(x ·)=2, V={y,z}=2
    // => p = (1+1)*1e6 // (2+2) = 500000 each
    val s = score(Seq(1L -> "x y", 2L -> "x z"))
    assert(s(1L) === (1L, 500000L))
    assert(s(2L) === (1L, 500000L))
  }

  test("repeated bigrams weight the doc mean by occurrence count") {
    // single doc "a b a b": c(a,b)=2 cp(a)=2, c(b,a)=1 cp(b)=1, V={a,b}=2
    // p(b|a) = 3e6//4 = 750000, p(a|b) = 2e6//3 = 666666
    // mean = (2*750000 + 666666) // 3 = 722222
    val s = score(Seq(1L -> "a b a b"))
    assert(s(1L) === (3L, 722222L))
  }

  test("docs too short for a bigram score 0 but still appear") {
    val s = score(Seq(1L -> "solo", 2L -> "", 3L -> "two words"))
    assert(s(1L) === (0L, 0L))
    assert(s(2L) === (0L, 0L))
    assert(s(3L)._1 === 1L)
  }

  test("generated-corpus invariants: totals, bounds, and smoothing ceiling") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val word = Gen.oneOf("a", "b", "c", "dd", "eee", "zz")
    val doc = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val docs = (0 until 120).flatMap(i =>
      doc.apply(Gen.Parameters.default, Seed(7L + i)).map(t => (i.toLong, t)))
    val out = BigramLm.scoreDocs(docs.toDF("doc_id", "text")).collect()
    // one row per input doc
    assert(out.length === docs.length)
    out.foreach { r =>
      val (id, n, s) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val len = docs.find(_._1 == id).get._2.trim.split("\\s+").count(_.nonEmpty)
      // n_bigrams = max(tokens-1, 0); score in [0, 1e6); smoothing makes
      // p strictly < 1 whenever the model has >1 next-token type
      assert(n === math.max(len - 1, 0), s"doc $id")
      assert(s >= 0L && s <= 1000000L)
      if (n == 0) assert(s === 0L)
    }
  }

  test("gibberish scores below repeated boilerplate on the same corpus") {
    val common = (1 to 8).map(i => i.toLong -> "the quick brown fox jumps over the lazy dog")
    val rare = Seq(100L -> "zxq qvw wfj jkt tqz")
    val s = score(common ++ rare)
    assert(s(100L)._2 < s(1L)._2)
  }

  test("collocations rank an exclusive pair above a promiscuous one, with exact integer lift") {
    import spark.implicits._
    // N = 30 bigram occurrences: "zqx wvy" exclusive (c12=c1=c2=10),
    // "the cat"/"the dog" share the left word (c1(the)=20)
    val docs = ((1L to 10L).map(i => (i, "zqx wvy")) ++
      (11L to 20L).map(i => (i, "the cat")) ++
      (21L to 30L).map(i => (i, "the dog"))).toDF("doc_id", "text")
    val got = BigramLm.collocations(docs, minCount = 5, topK = 10)
      .as[(String, String, Long, Long)].collect()
    assert(got.length === 3)
    // lift(zqx,wvy) = (10e6 div 10)*30 div 10 = 3e6; lift(the,·) = (10e6 div 20)*30 div 10 = 1.5e6
    assert(got.head === (("zqx", "wvy", 10L, 3000000L)))
    assert(got.tail.map(_._4).toSeq === Seq(1500000L, 1500000L))
    // tie broken by (w1, w2): cat before dog
    assert(got.tail.map(_._2).toSeq === Seq("cat", "dog"))
  }

  test("collocations count floor drops singleton bigrams") {
    import spark.implicits._
    val docs = ((1L to 10L).map(i => (i, "zqx wvy")) :+ ((99L, "one off"))).toDF("doc_id", "text")
    val got = BigramLm.collocations(docs, minCount = 5, topK = 10).collect()
    assert(got.length === 1 && got.head.getString(0) === "zqx")
  }
}
