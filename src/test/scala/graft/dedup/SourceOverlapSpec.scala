package graft.dedup

import graft.SparkSpecBase
import graft.Tables
import graft.queries.TrainingData
import org.apache.spark.sql.functions._

/** Pins x75 cross-source duplication-matrix semantics against an
  * independent recomputation from the registered pair table: unordered
  * cell collapse, pair conservation, and distinct-doc counting. */
class SourceOverlapSpec extends SparkSpecBase {

  test("matrix conserves pairs, collapses orientation, counts distinct docs") {
    val docs = Tables.documents(spark, sfDir)
    val got = TrainingData.queries("x75_source_overlap")(spark, sfDir)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(got.keys.forall { case (a, b) => a <= b }, "cells are unordered-collapsed")

    // independent recomputation: collect the (small) verified pair set
    // and fold the matrix in Scala
    val src = docs.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = Dedup.minhashNearDups(docs, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = pairs.groupBy { case (a, b) =>
      val (sa, sb) = (src(a), src(b))
      if (sa <= sb) (sa, sb) else (sb, sa)
    }.map { case (cell, ps) =>
      cell -> (ps.size.toLong, ps.flatMap(p => Seq(p._1, p._2)).distinct.size.toLong)
    }
    assert(got === expected)
    assert(got.values.map(_._1).sum === pairs.size.toLong, "every pair lands in one cell")
  }
}
