package graft.dedup

import graft.SparkSpecBase
import graft.Tables
import graft.queries.TrainingData
import org.apache.spark.sql.functions._

/** Pins x76 composition-drift semantics against an independent Scala
  * recomputation: per-source counts/char mass for both versions, integer
  * ppm shares against each version's total, and the delta. */
class SnapshotDriftSpec extends SparkSpecBase {

  test("drift table matches an independent recomputation and ppm invariants") {
    val rows = TrainingData.queries("x76_snapshot_drift")(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def comp(pred: Long => Boolean, edit: Boolean) = {
      val v = docs.filter(d => pred(d._1)).map { case (id, src, text) =>
        (src, if (edit && id % 7 == 0) text + " [edited]" else text)
      }
      val total = v.length.toLong
      v.groupBy(_._1).map { case (src, ds) =>
        src -> (ds.length.toLong, ds.map(_._2.length.toLong).sum,
          ds.length.toLong * 1000000L / total)
      }
    }
    val c1 = comp(_ % 10 != 0, edit = false)
    val c2 = comp(_ % 10 != 1, edit = true)
    assert(rows.map(_.getString(0)).toSeq ===
      (c1.keySet ++ c2.keySet).toSeq.sorted, "one row per source, ordered")
    rows.foreach { r =>
      val src = r.getString(0)
      val (n1, ch1, s1) = c1.getOrElse(src, (0L, 0L, 0L))
      val (n2, ch2, s2) = c2.getOrElse(src, (0L, 0L, 0L))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
        ((n1, n2, ch1, ch2)), s"counts/chars for $src")
      assert((r.getLong(5), r.getLong(6), r.getLong(7)) === ((s1, s2, s2 - s1)),
        s"ppm shares for $src")
    }
    // integer shares sum to 10^6 minus at most one ulp per source (floor division)
    val sum1 = rows.map(_.getLong(5)).sum
    assert(sum1 <= 1000000L && sum1 > 1000000L - rows.length, "v1 shares ≈ 1e6")
    val sum2 = rows.map(_.getLong(6)).sum
    assert(sum2 <= 1000000L && sum2 > 1000000L - rows.length, "v2 shares ≈ 1e6")
    assert(rows.map(_.getLong(7)).sum === sum2 - sum1, "deltas conserve mass")
  }

  test("drift and overlap tables are partition-invariant") {
    val docs = graft.Tables.documents(spark, sfDir)
    def fold(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.mkString("|")).toSet
    val d1 = fold(TrainingData.queries("x76_snapshot_drift")(spark, sfDir))
    // same query over a differently-partitioned scan must be identical
    // (integer div + bounded-key aggregate: no order sensitivity)
    val pairs = Dedup.minhashNearDups(docs, 0.5)
    assert(fold(TrainingData.sourceOverlap(pairs.repartition(7), docs.repartition(5)))
      === fold(TrainingData.sourceOverlap(pairs, docs)))
    assert(d1 === fold(TrainingData.queries("x76_snapshot_drift")(spark, sfDir)))
  }
}
