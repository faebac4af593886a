package graft.queries

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Pins the round-10 reduction/maintenance/diff tranche (x153-x158)
  * beyond the DuckDB hash gate: the structural guarantees each
  * operator promises, on the real sf0.001 tables.
  */
class ChainReductionSpec extends SparkSpecBase {

  test("x153 Yannakakis reduction ≡ the direct chain join, row for row") {
    val red = Warehouse.queries("x153_yannakakis")(spark, sfDir).collect()
    val dir = Warehouse.queries("q_chain_direct")(spark, sfDir).collect()
    assert(red.toSeq === dir.toSeq)
  }

  test("x153's reduced order set is output-bounded (the Yannakakis guarantee)") {
    // every row surviving the down-pass joins a EUROPE customer — no
    // dangling intermediate beyond join selectivity
    val eurCust = Tables.customer(spark, sfDir)
      .join(Tables.nation(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sfDir).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey")
    val expected = Tables.orders(spark, sfDir)
      .join(eurCust, col("o_custkey") === col("c_custkey")).count()
    val all = Tables.orders(spark, sfDir).count()
    assert(expected < all, "gate data must make the reduction selective")
  }

  test("x161 eager aggregation ≡ aggregate-after-join, row for row") {
    val eager = Warehouse.queries("x161_eager_agg")(spark, sfDir).collect()
    val direct = Warehouse.queries("q_agg_after_join")(spark, sfDir).collect()
    assert(eager.toSeq === direct.toSeq)
  }

  test("x154 signed fold: an insert+retract pair is an exact no-op") {
    import spark.implicits._
    val rows = Seq(("O", java.math.BigDecimal.valueOf(123.45), 1L),
                   ("O", java.math.BigDecimal.valueOf(123.45), -1L))
      .toDF("o_orderstatus", "p", "sign")
    val folded = rows.groupBy("o_orderstatus")
      .agg(sum(col("sign")).as("n"),
        sum((col("p") * col("sign")).cast("decimal(28,2)")).as("total"))
      .collect()
    assert(folded.length === 1)
    assert(folded(0).getAs[Long]("n") === 0L)
    assert(folded(0).getAs[java.math.BigDecimal]("total").signum === 0)
  }

  test("x154 converges to the final-state aggregate through all three change kinds") {
    val got = Warehouse.queries("x154_retractable_ivm")(spark, sfDir)
      .select("o_orderstatus", "n_orders", "total").collect()
    val want = Tables.orders(spark, sfDir)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
      .orderBy("o_orderstatus")
      .collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ===
           want.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq)
  }

  test("x155 accounts for every planted divergence, and only those") {
    val o = Tables.orders(spark, sfDir)
    val dropped = o.filter(col("o_orderkey").isin(113L, 257L)).count()
    val extra = o.filter(col("o_orderkey") === 114L).count()
    val changed = o.filter(col("o_orderkey").isin(112L, 256L, 400L)).count()
    assert(dropped > 0 && extra > 0 && changed > 0,
      "gate data must plant all three divergence kinds")
    val out = Warehouse.queries("x155_bucket_diff")(spark, sfDir)
      .agg(sum("n_missing").as("m"), sum("n_extra").as("e"),
        sum("n_changed").as("c")).head()
    assert(out.getAs[Long]("m") === dropped)
    assert(out.getAs[Long]("e") === extra)
    assert(out.getAs[Long]("c") === changed)
    // the fault set touches exactly the three planted buckets (0,1,2 mod
    // 16) — the diff never fans out past the dirty key ranges
    val buckets = Warehouse.queries("x155_bucket_diff")(spark, sfDir)
      .select("bucket").collect().map(_.getLong(0)).toSet
    assert(buckets === Set(0L, 1L, 2L))
  }

  test("x157 as-of reads: tombstones drop, latest image wins, clones appear at v2 only") {
    val o = Tables.orders(spark, sfDir)
    val nAll = o.count()
    val nLive = o.filter(pmod(col("o_orderkey"), lit(13L)) =!= 2).count()
    val nClones = o.filter(pmod(col("o_orderkey"), lit(17L)) === 1).count()
    // the v2-over-v1 override must be exercised by the gate data
    val overridden = o.filter(pmod(col("o_orderkey"), lit(7L)) === 3 &&
      pmod(col("o_orderkey"), lit(19L)) === 4 &&
      pmod(col("o_orderkey"), lit(13L)) =!= 2).count()
    assert(overridden > 0, "need a key updated in BOTH v1 and v2")
    val rows = Warehouse.queries("x157_time_travel")(spark, sfDir).collect()
    assert(rows.map(r => (r.getInt(0), r.getLong(1))).toSeq ===
      Seq((0, nAll), (1, nLive), (2, nLive + nClones)))
    // v2 total equals the direct reconstruction (override priority: +25
    // beats +50 for doubly-updated keys; clones at base price)
    val p = col("o_totalprice").cast("decimal(18,2)")
    val k = col("o_orderkey")
    val s2 = o.filter(pmod(k, lit(13L)) =!= 2)
      .select(when(pmod(k, lit(19L)) === 4, p + 25.0)
        .when(pmod(k, lit(7L)) === 3, p + 50.0)
        .otherwise(p).cast("decimal(18,2)").as("p"))
      .unionByName(o.filter(pmod(k, lit(17L)) === 1).select(p.as("p")))
      .agg(sum("p").cast("double")).head().getDouble(0)
    assert(rows(2).getDouble(2) === s2)
  }

  test("x158 IND verdicts: true FKs hold, the reversed edge is violated, the spurious dense-range IND holds") {
    val byName = Warehouse.queries("x158_ind_audit")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getInt(3)).toMap
    assert(byName("lineitem.l_orderkey<orders.o_orderkey") === 1)
    assert(byName("orders.o_custkey<customer.c_custkey") === 1)
    assert(byName("customer.c_nationkey<nation.n_nationkey") === 1)
    assert(byName("nation.n_regionkey<region.r_regionkey") === 1)
    // orders with no lineitems violate the reversed edge
    assert(byName("orders.o_orderkey<lineitem.l_orderkey") === 0)
    // dense surrogate ranges contain each other — the spurious IND
    // HOLDS, which is exactly why discovery needs semantic confirmation
    assert(byName("lineitem.l_suppkey<part.p_partkey") === 1)
  }

  test("x159 late-arriving history revises the as-of answer; settled cells agree") {
    val cells = Warehouse.queries("x159_bitemporal")(spark, sfDir).collect()
      .groupBy(r => (r.getInt(0), r.getString(1)))
      .map { case (k, rows) =>
        k -> rows.map(r => r.getString(2) -> r.getLong(3)).toMap }
    // keys ≡0 mod 5 with 1996 valid-time arrive only in version 1 — the
    // 1996-06 answer MUST change between v0 and v1 (the correction)
    assert(cells((0, "1996-06-01")) !== cells((1, "1996-06-01")),
      "late 1996 events must revise the 1996-06 as-of answer")
    // v2 adds only events valid-after the 1996-06 probe — settled
    assert(cells((1, "1996-06-01")) === cells((2, "1996-06-01")))
    // v1 lacks the ≥1997 arrivals of the late keys — 1997-06 still moves
    assert(cells((1, "1997-06-01")) !== cells((2, "1997-06-01")))
    // full knowledge at T2: one valid row per customer whose history
    // started by then
    val expected = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate").isNotNull)
      .groupBy("o_custkey").agg(min("o_orderdate").as("first"))
      .filter(col("first") <= lit("1997-06-01").cast("timestamp")).count()
    assert(cells((2, "1997-06-01")).values.sum === expected)
  }

  test("x160 vault counts: hubs are key sets, deltas are the planted changes, reconstruction is total") {
    val byName = Warehouse.queries("x160_data_vault")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val c = Tables.customer(spark, sfDir)
    assert(byName("hub_customer") === c.count())
    assert(byName("hub_order") === Tables.orders(spark, sfDir).count())
    assert(byName("sat_customer_load2_deltas") ===
      c.filter(pmod(col("c_custkey"), lit(7L)) === 0).count())
    assert(byName("reconstruction_matches") === c.count(),
      "every customer's vault-current segment must match the source truth")
  }

  test("x162 sketch verdicts hold and the union estimate is partition-order-invariant") {
    val out = Warehouse.queries("x162_sketch_rollup")(spark, sfDir).collect()
    assert(out.nonEmpty && out.forall(_.getAs[Boolean]("est_within_5pct")),
      "every region's sketch-rollup estimate must sit within 5% of exact")
    // determinism: HLL register merges are max-folds — the estimate
    // (hence the verdict bit) must not depend on partitioning
    val keyed = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey")
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sfDir).select("n_nationkey", "n_regionkey"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_nationkey"), col("n_regionkey"), col("l_partkey"))
    def estimates(df: org.apache.spark.sql.DataFrame): Map[Int, Long] =
      df.groupBy("n_nationkey", "n_regionkey")
        .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
        .groupBy("n_regionkey")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(estimates(keyed.repartition(3)) === estimates(keyed.repartition(11)))
  }

  test("x163 conflict accounting: intersection size, survivor count, merged totals") {
    val byName = Warehouse.queries("x163_occ_conflicts")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = Tables.orders(spark, sfDir)
    val expectedConf = o.filter(pmod(col("o_orderkey"), lit(70L)) === 1).count()
    assert(expectedConf > 0, "gate data must plant a write-write conflict")
    assert(byName("conflicts") === expectedConf)
    assert(byName("applied_b_rows") + byName("conflicts") === byName("txn_b_rows"))
    assert(byName("final_rows") === o.count())
  }

  test("x164 matches an independent in-process Bellman-Ford on hand-built shingles") {
    // fully independent reference: tokenize + shingle in plain Scala,
    // same integer weights and threshold, 3 relaxation rounds
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val shingles = docs.map { case (id, text) =>
      id -> text.trim.toLowerCase.split("\\s+").toSeq
        .sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    }
    val ids = shingles.keys.toSeq
    val edges = (for {
      a <- ids; b <- ids if a < b
      i = (shingles(a) & shingles(b)).size
      na = shingles(a).size; nb = shingles(b).size
      if i * 10 >= (na + nb - i) * 3
    } yield (a, b, (na + nb - 2 * i).toLong)).flatMap {
      case (a, b, w) => Seq((a, b, w), (b, a, w))
    }
    var dist: Map[Long, Option[Long]] =
      ids.map(id => id -> (if (id % 50 == 0) Some(0L) else None)).toMap
    for (_ <- 1 to 3) {
      val relaxed = edges.flatMap { case (s0, t, w) =>
        dist(s0).map(d0 => t -> (d0 + w)) }
        .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).min }
      dist = dist.map { case (id, d0) =>
        id -> Seq(d0, relaxed.get(id)).flatten.minOption }
    }
    val got = TrainingData.queries("x164_sssp")(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got === dist)
    assert(dist.values.flatten.exists(_ > 0), "a non-seed doc must be reached")
  }

  test("x156 master identity matches x38's keeper rule; modes are true maxima") {
    val golden = TrainingData.queries("x156_golden_record")(spark, sfDir)
    val keepers = TrainingData.queries("x38_cluster_keeper")(spark, sfDir)
      .filter(col("is_keeper") === 1).select("component", "keeper_id")
    val disagree = golden.join(keepers, Seq("component"))
      .filter(col("master_id") =!= col("keeper_id")).count()
    assert(disagree === 0L, "golden master must be the keeper-by-length")
    // the surviving lang's member count is the component maximum
    val labels = graft.dedup.Dedup.nearDupComponents(
      graft.dedup.Dedup.minhashNearDups(Tables.documents(spark, sfDir), 0.5),
      Tables.documents(spark, sfDir))
    val counts = labels.join(Tables.documents(spark, sfDir), Seq("doc_id"))
      .groupBy("component", "lang").agg(count(lit(1)).as("cnt"))
    val maxes = counts.groupBy("component").agg(max("cnt").as("mx"))
    val bad = golden.join(counts, Seq("component", "lang"))
      .join(maxes, Seq("component"))
      .filter(col("cnt") =!= col("mx")).count()
    assert(bad === 0L, "surviving lang must carry the maximal member count")
  }
}
