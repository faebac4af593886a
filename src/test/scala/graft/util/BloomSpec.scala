package graft.util

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpecBase {
  import spark.implicits._

  private def keys(prefix: String, n: Int) =
    (0 until n).map(i => s"$prefix$i").toDF("sh")

  test("no false negatives: every member passes its own filter") {
    val members = keys("m", 500)
    val bits = Bloom.bits(members, "sh")
    assert(Bloom.passing(members, bits, "sh").count() === 500)
  }

  test("non-members mostly rejected at the designed geometry; FP rate stays tiny") {
    val members = keys("m", 2500) // the gate corpus's benchmark size
    val bits = Bloom.bits(members, "sh")
    val probes = keys("q", 10000)
    val fp = Bloom.passing(probes, bits, "sh").count()
    // fill ≈ 2500·3/65536 ≈ 11% ⇒ FP ≈ 0.11³ ≈ 0.15%; 10× headroom
    assert(fp <= 150, s"false-positive count $fp exceeds 1.5% of 10000 probes")
  }

  test("passing keeps probe columns and is deterministic under repartitioning") {
    val members = keys("m", 100)
    val bits = Bloom.bits(members, "sh")
    val probes = (0 until 300).map(i => (i.toLong, s"m${i % 150}")).toDF("doc_id", "sh")
    val a = Bloom.passing(probes, bits, "sh").orderBy("doc_id", "sh").collect().toSeq
    val b = Bloom.passing(probes.repartition(7), bits, "sh")
      .orderBy("doc_id", "sh").collect().toSeq
    assert(a === b)
    assert(a.nonEmpty && a.head.schema.fieldNames.toSeq === Seq("doc_id", "sh"))
  }
}
