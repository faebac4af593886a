package graft.text

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpecBase {
  import spark.implicits._
  import TextFunctions._

  private def one(text: String) = Seq(text).toDF("text")

  test("langId picks the language with the most marker hits, 'und' when none") {
    val cases = Seq(
      "the cat is on the mat and it is happy" -> "en",
      "el perro y la casa de los vecinos" -> "es",
      "der hund und die katze ist ein tier" -> "de",
      "xyzzy plugh qwerty" -> "und")
    cases.foreach { case (text, want) =>
      val got = one(text).select(langId(tokens(col("text")))).first().getString(0)
      assert(got === want, s"for: $text")
    }
  }

  test("shingles: n tokens yield n-2 trigram shingles; short docs yield none") {
    assert(one("a b c d e").select(size(shingles(tokens(col("text"))))).first().getInt(0) === 3)
    assert(one("a b").select(size(shingles(tokens(col("text"))))).first().getInt(0) === 0)
  }

  test("qualityScore stays in [0,1] and rewards natural text over noise") {
    val natural = one("the quick brown fox is seen in the park and it is fine " * 5)
      .select(qualityScore(col("text"))).first().getDouble(0)
    val noise = one("@@!! ## $$%% ^^&&")
      .select(qualityScore(col("text"))).first().getDouble(0)
    assert(natural >= 0.0 && natural <= 1.0)
    assert(noise >= 0.0 && noise <= 1.0)
    assert(natural > noise)
  }

  test("bpeTokens splits letter runs, digit runs, punctuation") {
    val got = one("ab12,cd").select(bpeTokens(col("text"))).first().getSeq[String](0)
    assert(got === Seq("ab", "12", ",", "cd"))
  }

  test("stripMarkup removes tags, unescapes entities, collapses whitespace") {
    val got = one("""<div><p class="big">Hello &amp; <b>world</b></p>&nbsp;  </div>""")
      .select(stripMarkup(col("text"))).first().getString(0)
    assert(got === "Hello & world")
  }

  test("canonicalUrl lowers host, strips fragment/tracking, trims slash") {
    val cases = Seq(
      "HTTPS://Example.COM/Path/?utm_source=x&id=7#frag" -> "https://example.com/Path/?id=7",
      "http://A.b/x/" -> "http://a.b/x",
      "https://h.io/p?utm_campaign=z" -> "https://h.io/p")
    cases.foreach { case (in, want) =>
      val got = one(in).select(canonicalUrl(col("text"))).first().getString(0)
      assert(got === want, s"for: $in")
    }
  }

  test("redactPii masks emails, IPs and phones, leaves prose intact") {
    val got = one("mail a.b+c@x-corp.io or +1-555-0101 from 10.0.3.7, keep v1.2 and 2024")
      .select(redactPii(col("text"))).first().getString(0)
    assert(got === "mail <EMAIL> or <PHONE> from <IP>, keep v1.2 and 2024")
  }

  test("repetitionRatio: 0 for short/unique text, rises with duplicate shingles") {
    def ratio(s: String): Double =
      one(s).select(repetitionRatio(tokens(col("text")))).first().getDouble(0)
    assert(ratio("too short") === 0.0)
    assert(ratio("all tokens here are unique today") === 0.0)
    // "a b c a b c a b c": 7 shingles, 3 distinct -> 4/7
    assert(math.abs(ratio("a b c a b c a b c") - 4.0 / 7.0) < 1e-6)
  }

  test("fingerprint is invariant to case and whitespace runs") {
    val fps = Seq("Hello  World", "hello world", " HELLO\tWORLD ")
      .toDF("text").select(fingerprint(col("text"))).distinct()
    assert(fps.count() === 1)
  }
}
