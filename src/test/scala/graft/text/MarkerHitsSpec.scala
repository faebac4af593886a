package graft.text

import graft.SparkSpecBase
import graft.functions.MarkerHits
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

class MarkerHitsSpec extends SparkSpecBase {
  import spark.implicits._

  private val lists = Seq(Seq("the", "a"), Seq("la", "el"), Seq("the", "la"))

  test("one traversal counts every list, duplicates included (codegen path)") {
    val df = Seq(
      "the cat la the",  // the×2, la×1
      "",                // splits to [""] — matches nothing
      "el la el").toDF("text")
      .select(MarkerHits.marker_hits(TextFunctions.tokens(col("text")), lists).as("h"))
    val got = df.collect().map(_.getSeq[Int](0).toSeq).toSeq
    assert(got === Seq(Seq(2, 1, 3), Seq(0, 0, 0), Seq(0, 3, 1)))
  }

  test("interpreted eval matches codegen semantics; null array yields null") {
    def arr(xs: String*): ArrayData =
      new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])
    val e = MarkerHits(Literal.create(arr("the", "la", "zzz"),
      ArrayType(StringType)), lists)
    assert(e.eval(null).asInstanceOf[ArrayData].toIntArray().toSeq === Seq(1, 1, 2))
    val eNull = MarkerHits(Literal.create(null, ArrayType(StringType)), lists)
    assert(eNull.eval(null) == null)
  }

  test("property: equals a naive Scala count on generated token arrays") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val vocab = Seq("the", "a", "la", "el", "und", "zzz", "", "der", "不")
    val tokGen = Gen.listOf(Gen.oneOf(vocab))
    val samples: Seq[Seq[String]] = (0 until 200).flatMap(i =>
      tokGen.apply(Gen.Parameters.default, Seed(7L + i))).map(_.toSeq)
    val got = samples.toDF("t")
      .select(MarkerHits.marker_hits(col("t"), lists).as("h"))
      .collect().map(_.getSeq[Int](0).toSeq)
    val want = samples.map(ts => lists.map(ws => ts.count(ws.contains)))
    assert(got.toSeq === want)
  }

  test("agrees with the HOF hitCount form on real data") {
    val docs = graft.Tables.documents(spark, sfDir)
    val markers = TextFunctions.LangMarkers.map(_._2)
    val t = TextFunctions.tokens(col("text"))
    val viaNative = docs
      .select(col("doc_id"), MarkerHits.marker_hits(t, markers).as("h"))
      .select(col("doc_id") +: markers.indices.map(i => col("h").getItem(i).as(s"h$i")): _*)
    val viaHof = docs.select(col("doc_id") +:
      markers.zipWithIndex.map { case (ws, i) =>
        TextFunctions.hitCount(t, ws).as(s"h$i") }: _*)
    assert(viaNative.orderBy("doc_id").collect().toSeq ===
      viaHof.orderBy("doc_id").collect().toSeq)
  }
}
