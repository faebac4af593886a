package graft.queries

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Behavior pins for the fifth round-12 tranche (X229-X231): drift-ppm
  * arithmetic, mix-rate policy invariants, and retention accounting. */
class R12eTrancheSpec extends SparkSpecBase {

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sfDir)

  test("x204: ppm values are well-formed and one mover recomputes exactly") {
    val rows = run("x204_vocab_drift").collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    rows.foreach { r =>
      val (pa, pb, d) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(pa >= 0 && pa <= 1000000L && pb >= 0 && pb <= 1000000L)
      assert(d == math.abs(pa - pb), "delta must be the exact |early − late|")
    }
    // independent recompute of the top mover's two ppm values
    val tok0 = rows.head.getString(0)
    val docs = Tables.documents(spark, sfDir)
    val mx = docs.agg(max("doc_id")).collect()(0).getLong(0)
    val toks = docs.select(
        (col("doc_id") * 2 <= mx).as("early"),
        explode(graft.text.TextFunctions.tokens(col("text"))).as("tok"))
    val Seq(na, nb) = Seq(true, false).map(h =>
      toks.filter(col("early") === h).count())
    val Seq(ca, cb) = Seq(true, false).map(h =>
      toks.filter(col("early") === h && col("tok") === tok0).count())
    assert(rows.head.getLong(1) == ca * 1000000L / na &&
           rows.head.getLong(2) == cb * 1000000L / nb,
      s"top mover '$tok0' ppm must recompute from raw counts")
  }

  test("x205: rate saturates at 1e6 exactly on short sources; upsampling only there") {
    val rows = run("x205_mix_rates").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (avail, target, rate, up) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(rate <= 1000000L)
      // note: up can equal exactly 100 when a source is < 1 % short
      // (integer division), so the short-source iff is pinned on rate;
      // and avail == target also saturates rate, hence <=
      assert((avail <= target) == (rate == 1000000L),
        "a source's rate saturates at 1e6 ppm iff it is at-or-short of target")
      assert(up >= 100L)
      assert(avail >= target || up == target * 100L / avail)
    }
    assert(rows.map(_.getLong(2)).distinct.length == 1,
      "uniform policy: every source gets the same target")
  }

  test("x207: the bounded aggregate plans partial ObjectHashAggregate, no Window; partitioning-independent") {
    val df = run("x207_topk_agg")
    val plan = df.queryExecution.sparkPlan
    assert(plan.collect {
        case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
      }.size >= 2,
      "typed-Aggregator top-k must run as partial + final ObjectHashAggregate")
    assert(df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }.isEmpty,
      "the whole point: no hot-key window partition anywhere in the plan")
    // partitioning independence: a skewed repartition of the input must
    // not change the merged result (total buffer order)
    val base = df.collect().map(_.toSeq)
    val o = Tables.orders(spark, sfDir).repartition(13).select(
      col("o_orderpriority"),
      (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents"),
      col("o_orderkey").as("id"))
    val re = o.groupBy("o_orderpriority")
      .agg(graft.functions.TopKAgg.topk(5)(col("cents"), col("id")).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")))
      .select(col("o_orderpriority"), (col("pos") + 1).as("rnk"),
        col("col.id").as("o_orderkey"), col("col.cents").as("cents"))
      .orderBy("o_orderpriority", "rnk")
      .collect().map(_.toSeq)
    assert(base.toSeq == re.toSeq, "merge must be partitioning-independent")
    // k <= 0 must fail at construction, not as .last-on-empty inside a task
    intercept[IllegalArgumentException](new graft.functions.TopKAgg(0))
    intercept[IllegalArgumentException](new graft.functions.TopKAgg(-3))
  }

  test("x208: tokenization is a per-table bijection; the token join carries the key join's rows") {
    def token(c: org.apache.spark.sql.Column) =
      md5(concat(lit("graft_pii_salt_v1:"), c.cast("string")))
    val cust = Tables.customer(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
    assert(cust.select(token(col("c_custkey"))).distinct().count() ==
           cust.select("c_custkey").distinct().count(),
      "token collision on customer keys would merge identities")
    assert(ord.select(token(col("o_custkey"))).distinct().count() ==
           ord.select("o_custkey").distinct().count(),
      "token collision on order FKs would merge customers")
    val plainRows = ord.join(cust, col("o_custkey") === col("c_custkey")).count()
    assert(run("x208_pseudonymize").agg(sum("n_orders")).collect()(0).getLong(0)
      == plainRows, "the pseudonymized join must carry exactly the key join's rows")
  }

  test("x209: ndv algebra — max(ndv_a, ndv_b) ≤ ndv_ab ≤ ndv_a·ndv_b; fill ≤ 1e6") {
    val rows = run("x209_column_correlation").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (a, b, ab, ppm) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ab <= a * b && ab >= math.max(a, b),
        "pairwise ndv must sit between max and product of the marginals")
      assert(ppm == ab * 1000000L / (a * b) && ppm <= 1000000L)
    }
  }

  test("x210: every dimension reports once; dim-1 means recompute from raw sums") {
    val rows = run("x210_embedding_drift").collect()
    val dims = Tables.embeddings(spark, sfDir)
      .select(size(col("embedding"))).distinct().collect()(0).getInt(0)
    assert(rows.map(_.getInt(0)).toSeq == (1 to dims),
      "one row per dimension, dense and ordered")
    rows.foreach(r => assert(r.getLong(3) == math.abs(r.getLong(1) - r.getLong(2))))
    // independent recompute of dimension 1's two means
    val e = Tables.embeddings(spark, sfDir)
    val mx = e.agg(max("vec_id")).collect()(0).getLong(0)
    def mean(early: Boolean): Long = {
      val rs = e.filter(if (early) col("vec_id") * 2 <= mx else col("vec_id") * 2 > mx)
        .select(expr("cast(round(cast(embedding[0] as double) * 1000000) as bigint)").as("q"))
        .agg(sum("q"), count(lit(1))).collect()(0)
      val (s0, n) = (rs.getLong(0), rs.getLong(1))
      if (s0 >= 0) s0 / n else -((-s0) / n)
    }
    assert(rows.head.getLong(1) == mean(true) && rows.head.getLong(2) == mean(false),
      "dim-1 fixed-point means must recompute from raw element sums")
  }

  test("x206: v2 is never superseded; expire_safe ⟺ zero live; v0 covers every order") {
    val rows = run("x206_version_retention").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    assert(rows(2)._2 == 0L, "no version follows v2 — nothing there is superseded")
    rows.values.foreach { case (imgs, sup, live, safe) =>
      assert(live == imgs - sup)
      assert((safe == 1) == (live == 0L)) }
    assert(rows(0)._1 == Tables.orders(spark, sfDir).count(),
      "v0 is the full base snapshot")
    // v0's superseded rows = keys rewritten or tombstoned later
    val o = Tables.orders(spark, sfDir)
    val k = col("o_orderkey")
    val later = o.filter((pmod(k, lit(7L)) === 3 && pmod(k, lit(13L)) =!= 2) ||
        pmod(k, lit(13L)) === 2 ||
        (pmod(k, lit(19L)) === 4 && pmod(k, lit(13L)) =!= 2)).count()
    assert(rows(0)._2 == later, "v0 superseded count must match the construction")
  }
}
