package graft.plans

import graft.SparkSpecBase
import graft.queries.TrainingData
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Window
import org.apache.spark.sql.functions._

/** Guards the 100 TB scale contract for window shapes: an un-partitioned
  * Window (AllTuples distribution) funnels EVERY row through one task —
  * the x27_seq_pack plan regressed to that shape in r3 behind a comment
  * claiming otherwise, so the invariant is now machine-checked. */
class WindowScaleSafetySpec extends SparkSpecBase {

  private def unpartitionedWindows(df: DataFrame): Seq[Window] =
    df.queryExecution.optimizedPlan.collect {
      case w: Window if w.partitionSpec.isEmpty => w
    }

  test("x27_seq_pack has no un-partitioned Window anywhere in its plan") {
    val df = TrainingData.queries("x27_seq_pack")(spark, sfDir)
    assert(unpartitionedWindows(df).isEmpty,
      "global-order prefix sum must be two-phase (bucketed), not a global Window")
  }

  test("x44_shard_manifest inherits the same guarantee through seqPack") {
    val df = TrainingData.queries("x44_shard_manifest")(spark, sfDir)
    assert(unpartitionedWindows(df).isEmpty,
      "the manifest aggregation must ride the bucketed packing, not a global Window")
  }

  test("x27 two-phase prefix sum equals the single-window reference") {
    val got = TrainingData.queries("x27_seq_pack")(spark, sfDir).collect()
    // reference: the naive global window (fine on the 0.001 test corpus)
    val base = graft.Tables.documents(spark, sfDir).select(
      col("doc_id"),
      size(graft.text.TextFunctions.tokens(col("text"))).as("n_tokens"),
      graft.util.Sampling.shuffleKey(col("doc_id")).as("sk"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("sk")
    val want = base
      .withColumn("start_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("start_offset"),
        floor(col("start_offset") / 512).as("bin_id"))
      .orderBy("doc_id")
      .collect()
    assert(got.toSeq == want.toSeq)
  }

  test("x52_quality_cut never windows on the bare group key (bucket-partitioned only)") {
    val df = TrainingData.queries("x52_quality_cut")(spark, sfDir)
    assert(unpartitionedWindows(df).isEmpty)
    // row-bearing windows must partition by MORE than the group column —
    // a lang-only rank window would funnel the dominant language through
    // one task; only the metadata-sized histogram may window per group
    // (its rows are bounded by score/coarseDiv buckets, not corpus size)
    val rowWindows = df.queryExecution.optimizedPlan.collect {
      case w: Window if w.windowExpressions.exists(_.name == "__rn") => w
    }
    assert(rowWindows.nonEmpty, "expected the boundary rank window in the plan")
    rowWindows.foreach { w =>
      assert(w.partitionSpec.size >= 2,
        s"boundary rank must partition by (group, bucket), got ${w.partitionSpec}")
    }
  }

  test("f21 surrogate keys have no un-partitioned Window (ScalableRank two-phase)") {
    val df = graft.queries.Relational.queries("f21_surrogate_keys")(spark, sfDir)
    assert(unpartitionedWindows(df).isEmpty,
      "surrogate keying must use the bucketed two-phase rank, not a global Window")
  }

  test("ScalableRank.globalRowNumber equals the single-window reference, any partitioning") {
    val custs = graft.Tables.customer(spark, sfDir).select("c_custkey")
    val w = org.apache.spark.sql.expressions.Window.orderBy("c_custkey")
    val want = custs.select(col("c_custkey"),
        row_number().over(w).cast("long").as("row_num"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = graft.util.ScalableRank.globalRowNumber(custs, "c_custkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    val gotRepart = graft.util.ScalableRank
      .globalRowNumber(custs.repartition(13), "c_custkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotRepart === want)
  }

  test("ScalableRank.groupedRowNumber equals the grouped-window reference; partitions by (group, bucket)") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), expr("n_chars div 200").as("blk"),
        (col("n_chars") * 1000000L + col("doc_id")).as("ok"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang", "blk").orderBy("ok")
    val want = docs.select(col("doc_id"),
        row_number().over(w).cast("long").as("rn"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ranked = graft.util.ScalableRank.groupedRowNumber(
      docs, Seq("lang", "blk"), "ok", "rn")
    val got = ranked.select("doc_id", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    // the scale property itself: every window in the plan partitions by
    // MORE than the group key (group + bucket), so no whole group ever
    // sorts in one task
    ranked.queryExecution.optimizedPlan.collect { case w: Window => w }
      .foreach(w => assert(w.partitionSpec.size >= 3,
        s"grouped rank must window on (group..., bucket), got ${w.partitionSpec}"))
    assert(unpartitionedWindows(ranked).isEmpty)
  }

  test("groupedRowNumber keeps NULL group keys and ranks NULL order keys first (window parity)") {
    // inject a null GROUP for every 7th doc and a null ORDER key for
    // every 11th — a plain equi-join pipeline would silently DROP the
    // null-group rows; the window keeps them and ranks null keys first
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, lit(null)).otherwise(col("lang")).as("lang"),
        when(col("doc_id") % 11 === 0, lit(null))
          .otherwise(col("n_chars") * 1000000L + col("doc_id")).as("ok"))
    val total = docs.count()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang").orderBy("ok")
    val want = docs.select(col("doc_id"),
        row_number().over(w).cast("long").as("rn"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = graft.util.ScalableRank.groupedRowNumber(docs, Seq("lang"), "ok", "rn")
      .select("doc_id", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.size == total, "no row may vanish on null keys")
    // null order keys tie arbitrarily in BOTH forms — compare the
    // deterministic part exactly and the null-key rows by rank RANGE
    val nullDocs = docs.filter(col("ok").isNull)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.filterNot(p => nullDocs(p._1)) === want.filterNot(p => nullDocs(p._1)),
      "non-null rows must rank identically to the plain window")
    val nullRanksGot = got.filter(p => nullDocs(p._1)).map(_._2)
    val nullRanksWant = want.filter(p => nullDocs(p._1)).map(_._2)
    assert(nullRanksGot === nullRanksWant,
      "null order keys must occupy the same (leading) rank slots per group")
  }

  test("x168 linkage rank windows only on (lang, blk, bucket) — hot blocks sub-split") {
    val df = TrainingData.queries("x168_linkage_score")(spark, sfDir)
    assert(unpartitionedWindows(df).isEmpty)
    val windows = df.queryExecution.optimizedPlan.collect { case w: Window => w }
    assert(windows.nonEmpty, "expected the grouped rank window in the x168 plan")
    windows.foreach(w => assert(w.partitionSpec.size >= 3,
      s"x168's rank must sub-split blocks (lang, blk, bucket), got ${w.partitionSpec}"))
  }

  test("winnowing hashes shingles outside the window frame") {
    // the window aggregate's child must be a bound reference, not md5(...)
    // — WindowExec re-evaluates the child once per overlapping frame
    val df = graft.dedup.Dedup.winnowFingerprints(graft.Tables.documents(spark, sfDir))
    val inFrameHash = df.queryExecution.optimizedPlan.collect {
      case w: Window => w.windowExpressions.map(_.toString)
    }.flatten.filter(_.contains("md5"))
    assert(inFrameHash.isEmpty,
      s"md5 must be projected before the window, found: $inFrameHash")
  }
}
