package graft.queries

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Pins for the round-9 audit/governance operators: x82 length
  * outliers, x83 quantile-sketch audit, q_k_anonymity,
  * q_deletion_sweep. The oracle hash-gate proves values; these pin
  * planted semantics (the flag fires exactly where 3σ says), the
  * measured rank error behind x83's verdict bits, and the
  * broadcast-only plan shape of the deletion cascade. */
class AuditOpsSpec extends SparkSpecBase {

  test("x82: planted extreme is the only outlier; constant-length group has none") {
    import spark.implicits._
    // lang "a": ten ~20-token docs + one 500-token monster;
    // lang "b": constant length → σ=0 → strict > fires never
    val docs = ((1L to 10L).map(i => (i, "a", Seq.fill(18 + (i % 3).toInt)("w").mkString(" "))) :+
      (11L, "a", Seq.fill(500)("w").mkString(" "))) ++
      (20L to 24L).map(i => (i, "b", Seq.fill(7)("x").mkString(" ")))
    val df = docs.toDF("doc_id", "lang", "text")
    val out = {
      val base = df.select(col("doc_id"), col("lang"),
        size(graft.text.TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
      val g = base.groupBy("lang").agg(count(lit(1)).as("n"),
        sum(col("n_tokens")).as("sx"), sum(col("n_tokens") * col("n_tokens")).as("sxx"))
      val dev = col("n").cast("double") * col("n_tokens").cast("double") - col("sx").cast("double")
      base.join(g, Seq("lang"))
        .select(col("doc_id"),
          (dev * dev > lit(9.0) * (col("n").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double"))).cast("int").as("o"))
    }
    val flags = out.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(flags(11L) === 1, "the planted monster must flag")
    assert(flags.filter(_._2 == 1).keySet === Set(11L),
      s"only the monster flags: ${flags.filter(_._2 == 1)}")
  }

  test("x82: surface flags agree with a stddev_pop recompute on real data") {
    val out = TrainingData.queries("x82_length_outliers")(spark, sfDir)
    val stats = out.groupBy("lang").agg(
      avg(col("n_tokens").cast("double")).as("mu"),
      stddev_pop(col("n_tokens").cast("double")).as("sigma"))
    val joined = out.join(stats, Seq("lang"))
      .select(col("doc_id"), col("is_outlier"),
        (abs(col("n_tokens").cast("double") - col("mu")) > lit(3.0) * col("sigma"))
          .cast("int").as("expect"))
      .filter(col("is_outlier") =!= col("expect"))
    assert(joined.count() === 0,
      s"integer-sum flag disagrees with stddev recompute: ${joined.collect().mkString}")
    // and the screen is selective, not degenerate
    val n = out.count(); val o = out.filter(col("is_outlier") === 1).count()
    assert(o < n / 10, s"outlier screen flagged $o of $n")
  }

  test("x83: verdicts are true and the measured rank error sits inside the GK bound") {
    val r = TrainingData.queries("x83_quantile_audit")(spark, sfDir).collect().head
    assert(r.getAs[Int]("p50_within") === 1)
    assert(r.getAs[Int]("p90_within") === 1)
    assert(r.getAs[Int]("p99_within") === 1)
    // independent rank measurement for p50
    val n = r.getAs[Long]("n_rows")
    val est = Tables.lineitem(spark, sfDir)
      .agg(expr("approx_percentile(l_extendedprice, 0.5D, 1000)")).first().getDouble(0)
    val rank = Tables.lineitem(spark, sfDir)
      .filter(col("l_extendedprice") <= est).count()
    assert(math.abs(rank - 0.5 * n) <= 2.0 * n / 1000 + 1,
      s"p50 estimate rank $rank vs target ${0.5 * n} exceeds bound")
  }

  test("q_k_anonymity: histogram partitions the customer table; planted unique tuple lands in k=1") {
    val hist = Quality.queries("q_k_anonymity")(spark, sfDir).collect()
    val total = hist.map(_.getAs[Long]("n_rows")).sum
    assert(total === Tables.customer(spark, sfDir).count())
    hist.foreach { r =>
      assert(r.getAs[Long]("k") >= 1L)
      assert(r.getAs[Long]("n_rows") === r.getAs[Long]("k") * r.getAs[Long]("n_groups"))
    }
  }

  test("q_join_explosion: the histogram prediction equals the join it never ran") {
    val out = Quality.queries("q_join_explosion")(spark, sfDir).collect()
    val predicted = out.head.getAs[Long]("predicted_total")
    // actually run the self-join the guard priced (cheap at this SF)
    val li = Tables.lineitem(spark, sfDir).select("l_partkey")
    val actual = li.as("a").join(li.as("b"), col("a.l_partkey") === col("b.l_partkey")).count()
    assert(predicted === actual,
      s"predicted $predicted != actual join output $actual")
    // per-key contributions are internally consistent
    out.foreach { r =>
      assert(r.getAs[Long]("contrib") === r.getAs[Long]("cnt") * r.getAs[Long]("cnt"))
    }
  }

  test("q_deletion_sweep: internal consistency, true cascade counts, broadcast-only fact joins") {
    val df = Quality.queries("q_deletion_sweep")(spark, sfDir)
    val rows = df.collect().map(r => r.getString(0) ->
      (r.getAs[Long]("n_before"), r.getAs[Long]("n_deleted"), r.getAs[Long]("n_after"))).toMap
    rows.foreach { case (t, (b, d, a)) => assert(a === b - d, s"$t row inconsistent") }
    // recompute the cascade the straightforward way
    val del = Tables.customer(spark, sfDir).filter(col("c_custkey") % 97 === 0)
    val dord = Tables.orders(spark, sfDir)
      .join(del.select("c_custkey"), col("o_custkey") === col("c_custkey"), "left_semi")
    val dli = Tables.lineitem(spark, sfDir)
      .join(dord.select("o_orderkey"), col("l_orderkey") === col("o_orderkey"), "left_semi")
    assert(rows("customer")._2 === del.count())
    assert(rows("orders")._2 === dord.count())
    assert(rows("lineitem")._2 === dli.count())
    // the cascade must never shuffle a fact against a fact: every join
    // in the plan builds on the broadcast deletion side
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"deletion sweep must stay broadcast-only:\n$plan")
  }

  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_audit").toString
    rows.map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("x119: cross-source mirrors price as savings in the MIRROR source only") {
    // src1 owns both fingerprints (min doc_id); src2 doc 3 mirrors doc 1
    val dir = docsDir(Seq(
      (1L, "a b", "en", "src1"), (2L, "c", "en", "src1"),
      (3L, "a b", "en", "src2")))
    val got = TrainingData.queries("x119_dedup_savings")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got === Map(
      "src1" -> ((2L, 2L, 3L, 3L, 0L)),
      "src2" -> ((1L, 0L, 2L, 0L, 1000000L))), s"savings: $got")
  }

  test("x120: independent planted grid has zero deviation; a skewed cell ranks by the exact tie rule") {
    // perfectly independent 2×2 → every dev = 0
    val indep = docsDir(
      (1L to 10L).map(i => (i, s"t$i", "en", "src1")) ++
      (11L to 20L).map(i => (i, s"t$i", "en", "src2")) ++
      (21L to 25L).map(i => (i, s"t$i", "fr", "src1")) ++
      (26L to 30L).map(i => (i, s"t$i", "fr", "src2")))
    val devs = TrainingData.queries("x120_indep_residuals")(spark, indep)
      .collect().map(_.getAs[Long]("abs_dev"))
    assert(devs.forall(_ === 0L), s"independent grid must have zero deviation: ${devs.toSeq}")
    // skew fr/src2 to 15 docs → all four |dev| = 100, ties resolve by (lang, source)
    val skew = docsDir(
      (1L to 10L).map(i => (i, s"t$i", "en", "src1")) ++
      (11L to 20L).map(i => (i, s"t$i", "en", "src2")) ++
      (21L to 25L).map(i => (i, s"t$i", "fr", "src1")) ++
      (26L to 40L).map(i => (i, s"t$i", "fr", "src2")))
    val rows = TrainingData.queries("x120_indep_residuals")(spark, skew)
      .collect().map(r => (r.getString(0), r.getString(1), r.getAs[Long]("abs_dev")))
    assert(rows.toSeq === Seq(
      ("en", "src1", 100L), ("en", "src2", 100L),
      ("fr", "src1", 100L), ("fr", "src2", 100L)), s"order: ${rows.toSeq}")
    val first = TrainingData.queries("x120_indep_residuals")(spark, skew).collect()(0)
    assert(first.getAs[Long]("exp_micro") === 7500000L) // 20·15·1e6/40
    assert(first.getAs[Double]("contrib") ===
      (100.0 * 100.0) / (40.0 * 20.0 * 15.0))
  }
}
