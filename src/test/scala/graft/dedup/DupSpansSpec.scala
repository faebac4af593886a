package graft.dedup

import graft.SparkSpecBase
import graft.Tables
import org.apache.spark.sql.functions._

/** Pins the exact-substring cut-span semantics (Lee et al. 2022) the
  * synthetic corpus cannot isolate: cross-document-only flagging, the
  * interval-union island merge at the gap boundary, and the span
  * coordinate convention (1-based inclusive token range). */
class DupSpansSpec extends SparkSpecBase {
  import spark.implicits._

  private def spans(docs: org.apache.spark.sql.DataFrame) =
    Dedup.dupSpans(docs).orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))

  test("a shared phrase produces the exact token span in both documents") {
    // shared run = tokens 3..7 of doc 1 ("c d e f g"); 3 shingles at
    // positions 3,4,5 -> span [3, 7] in doc 1; in doc 2 the run starts
    // at token 1 -> span [1, 5]
    val docs = Seq(
      (1L, "a b c d e f g x y z"),
      (2L, "c d e f g q r s t u")).toDF("doc_id", "text")
    assert(spans(docs).toSeq === Seq((1L, 3, 7, 3L), (2L, 1, 5, 3L)))
  }

  test("within-document repetition alone is never flagged") {
    // doc 1 repeats its own phrase; no other doc shares any shingle
    val docs = Seq(
      (1L, "p q r p q r p q r"),
      (2L, "u v w x y z")).toDF("doc_id", "text")
    assert(spans(docs).isEmpty)
  }

  test("islands split exactly when the position gap exceeds n") {
    // doc 1 shares two runs with docs 2 and 3: positions 1..3 (shingles
    // at 1) and 8..10 (shingle at 8) — gap 7 > 3 => two spans; doc 4
    // shares overlapping runs at positions 1 and 4 — gap 3 <= 3 => one
    // merged span
    val docs = Seq(
      (1L, "a b c k l m n d e f"),
      (2L, "a b c z1 z2 z3"),
      (3L, "d e f z4 z5 z6"),
      (4L, "g h i j1 g h i j2"),
      (5L, "g h i q1 q2 q3"),
      (6L, "i j1 g w1 w2 w3")).toDF("doc_id", "text")
    val byDoc = spans(docs).groupBy(_._1)
    assert(byDoc(1L).map(t => (t._2, t._3)).toSeq.sorted === Seq((1, 3), (8, 10)))
    // doc 4: flagged shingles at 1 ("g h i"), 2 ("h i j1"), 3 ("i j1 g"),
    // 5 ("g h i") — gaps <= 3 merge into one span [1, 7]
    assert(byDoc(4L).map(t => (t._2, t._3)).toSeq === Seq((1, 7)))
  }

  test("corpus spans are well-formed and only cover flagged docs") {
    val docs = Tables.documents(spark, sfDir)
    val s = Dedup.dupSpans(docs).cache()
    assert(s.filter(col("span_end") < col("span_start") + 2).count() === 0,
      "every span covers at least one full 3-gram")
    assert(s.filter(col("n_shingles") > col("span_end") - col("span_start")).count() === 0,
      "shingle count is bounded by the span's start positions")
    // spans never overlap within a doc (interval union is maximal)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("span_start")
    val overlaps = s.withColumn("prev_end", lag("span_end", 1).over(w))
      .filter(col("prev_end").isNotNull && col("span_start") <= col("prev_end"))
    assert(overlaps.count() === 0)
    s.unpersist()
  }
}
