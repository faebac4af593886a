package graft.dedup

import graft.SparkSpecBase

class SnapshotDiffSpec extends SparkSpecBase {
  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed/unchanged by content fingerprint") {
    val v1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val v2 = Seq((2L, "beta"), (3L, "gamma edited"), (4L, "delta")).toDF("doc_id", "text")
    val got = Dedup.snapshotDiff(v1, v2).orderBy("doc_id")
      .as[(Long, String)].collect().toSeq
    assert(got === Seq((1L, "removed"), (2L, "unchanged"), (3L, "changed"), (4L, "added")))
  }

  test("whitespace-only re-crawls are unchanged (fingerprint canonicalization)") {
    val v1 = Seq((1L, "same  doc")).toDF("doc_id", "text")
    val v2 = Seq((1L, "  same doc ")).toDF("doc_id", "text")
    val got = Dedup.snapshotDiff(v1, v2).as[(Long, String)].collect().toSeq
    assert(got === Seq((1L, "unchanged")))
  }
}
