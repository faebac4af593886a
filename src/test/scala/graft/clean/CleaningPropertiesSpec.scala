package graft.clean

import graft.SparkSpecBase
import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style invariants (SURVEY §5.3) over ScalaCheck-generated
  * inputs, evaluated in bulk through one DataFrame per property so each
  * check is a single Spark job. */
class CleaningPropertiesSpec extends SparkSpecBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("numericFill is idempotent and never yields NULL or NaN") {
    val raw = sample(Gen.oneOf(
      Gen.choose(-1e9, 1e9).map(_.toString),
      Gen.const(""), Gen.const("n/a"), Gen.const(null: String),
      Gen.alphaStr, Gen.const("NaN")))
    val df = raw.toDF("x").select(
      Cleaning.numericFill(col("x")).as("once"),
      Cleaning.numericFill(Cleaning.numericFill(col("x"))).as("twice"))
    assert(df.filter(col("once") =!= col("twice")).count() === 0)
    assert(df.filter(col("once").isNull || isnan(col("once"))).count() === 0)
  }

  test("toPositive output is non-negative and idempotent") {
    val df = sample(Gen.choose(-1e12, 1e12)).toDF("x").select(
      Cleaning.toPositive(col("x")).as("once"),
      Cleaning.toPositive(Cleaning.toPositive(col("x"))).as("twice"))
    assert(df.filter(col("once") < 0).count() === 0)
    assert(df.filter(col("once") =!= col("twice")).count() === 0)
  }

  test("normalized (fingerprint canonical form) is idempotent") {
    val ws = Gen.oneOf(" ", "  ", "\t", "")
    val word = Gen.alphaNumStr.map(_.take(8))
    val text = Gen.listOfN(6, Gen.zip(word, ws)).map(_.map { case (w, s) => w + s }.mkString)
    val df = sample(text).toDF("x").select(
      TextFunctions.normalized(col("x")).as("once"),
      TextFunctions.normalized(TextFunctions.normalized(col("x"))).as("twice"))
    assert(df.filter(col("once") =!= col("twice")).count() === 0)
  }

  test("shingles count is max(0, n_tokens - 2) and caps never exceeded") {
    val tokens = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, Gen.const("w")))
    val df = sample(tokens.map(_.mkString(" "))).toDF("x")
      .select(size(TextFunctions.tokens(col("x"))).as("n"),
        size(TextFunctions.shingles(TextFunctions.tokens(col("x")))).as("s"))
    val bad = df.filter(col("s") =!= greatest(lit(0), col("n") - 2))
    assert(bad.count() === 0)
  }

  test("bucket always returns one of the declared labels") {
    val bounds = Seq((0.0, "neg"), (10.0, "low"), (100.0, "mid"))
    val labels = bounds.map(_._2) :+ "high"
    val df = sample(Gen.choose(-1e6, 1e6)).toDF("x")
      .select(Cleaning.bucket(col("x"), bounds, "high").as("b"))
    assert(df.filter(!col("b").isin(labels.map(l => l: Any): _*)).count() === 0)
  }

  test("leadingInt parses any leading digit run, NULL otherwise") {
    val df = sample(Gen.oneOf(
      Gen.choose(0, 999).map(n => s"$n months"),
      Gen.choose(0, 999).map(n => s"  $n yr"),
      Gen.alphaStr)).toDF("x")
      .select(col("x"), Cleaning.leadingInt(col("x")).as("n"))
    val bad = df.filter(
      (col("x").rlike("^\\s*\\d") && col("n").isNull) ||
      (!col("x").rlike("^\\s*\\d") && col("n").isNotNull))
    assert(bad.count() === 0)
  }
}
