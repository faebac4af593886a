package graft.functions

import graft.{SparkSpecBase, Tables}
import graft.sim.Similarity
import org.apache.spark.sql.functions._

class FixedPointDotSpec extends SparkSpecBase {
  import spark.implicits._

  test("native dot is bit-identical to the Column reference form over the real table") {
    val emb = Tables.embeddings(spark, sfDir)
    val mism = emb.select(
      Similarity.dotFixed(col("embedding"), col("embedding")).as("native"),
      Similarity.dotFixedColumns(col("embedding"), col("embedding")).as("ref"))
      .filter(col("native") =!= col("ref")).count()
    assert(mism === 0)
  }

  test("HALF_UP ties round away from zero, exactly like the Column round") {
    // 0.0078125f · 10⁶ = 7812.5 exactly (odd/128 is the float whose
    // product lands on a representable .5) — HALF_UP ⇒ ±7813, where
    // Math.round-style floor(x+0.5) would give -7812 for the negative
    val df = Seq((Array(0.0078125f, -0.0078125f), Array(1.0f, 1.0f)))
      .toDF("a", "b")
    val native = df.select(Similarity.dotFixed(col("a"), col("b"))).first().getLong(0)
    val ref = df.select(Similarity.dotFixedColumns(col("a"), col("b"))).first().getLong(0)
    assert(native === 7813L * 1000000L + (-7813L) * 1000000L)
    assert(native === ref)
  }

  test("native quantize is bit-identical to the transform lambda over the real table") {
    val emb = Tables.embeddings(spark, sfDir)
    val mism = emb.select(
      FixedPointQuantize.fixed_point_quantize(col("embedding")).as("native"),
      transform(col("embedding"),
        x => round(x.cast("double") * 1e6).cast("long")).as("ref"))
      .filter(not(col("native") <=> col("ref"))).count()
    assert(mism === 0)
  }

  test("property: exact-arithmetic q equals the BigDecimal HALF_UP reference on generated floats") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def ref(v: Float): Long =
      java.math.BigDecimal.valueOf(v.toDouble * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    // mix of uniform floats at embedding scale, adversarial tie/near-tie
    // values (odd/128 lands exactly on .5; the float below 0.5 is the
    // classic floor(x+0.5) trap), and sign flips
    val adversarial = Seq(0.0078125f, -0.0078125f, 0.5e-6f, -0.5e-6f,
      0.49999997f / 1e6f, 1.5f / 128f, -1.5f / 128f, 0f, -0f, 1e-7f)
    val gen = Gen.chooseNum(-10f, 10f)
    val samples = (0 until 5000).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(13L + i))) ++ adversarial
    samples.foreach { v =>
      assert(FixedPointDot.q(v) === ref(v), s"mismatch at $v")
    }
  }

  test("null semantics mirror the HOF chain: length mismatch and null element give null") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f), Array(1.0f)),
      (2L, Array(1.0f, 2.0f), Array(1.0f, 2.0f))
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), Similarity.dotFixed(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1))
    assert(out(1).getLong(1) === (1000000L * 1000000L + 2000000L * 2000000L))
  }
}
