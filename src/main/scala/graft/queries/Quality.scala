package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.quality.QualityChecks

/** Quality-check query surface (SURVEY §2.5 A2/A3/A5/A9, §5.5). */
object Quality {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A5 (`quality_checks.py:14-20`): per-column null profile, one pass.
    "a5_null_profile" -> ((s, d) =>
      QualityChecks.nullProfile(Tables.lineitem(s, d))),

    // A2/A3 (`quality_checks.py:22-33`, dict-key bug fixed per SURVEY §8.8):
    // volume + three separate uniqueness metrics.
    "a3_volume_uniqueness" -> ((s, d) =>
      QualityChecks.volumeMetrics(Tables.lineitem(s, d),
        Seq("l_orderkey", "l_partkey", "l_suppkey"))),

    // A9 (dashboard count-by-category): count customers per nation via a
    // broadcast dim join.
    "a9_count_by_group" -> ((s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("n_name")),

    // §5.5: FK-orphan summary over the star's declared join edges (J3).
    // The three lineitem edges fold into ONE lineitem scan (broadcast key
    // sets + a single aggregate); the orders→customer edge is a separate
    // single-scan pass, cross-joined as a 1-row frame.
    "q_fk_orphan_summary" -> ((s, d) => {
      val li = QualityChecks.orphanSummaryOnePass(Tables.lineitem(s, d), Seq(
        ("li_orphan_orders", Tables.orders(s, d), "l_orderkey", "o_orderkey"),
        ("li_orphan_part", Tables.part(s, d), "l_partkey", "p_partkey"),
        ("li_orphan_supp", Tables.supplier(s, d), "l_suppkey", "s_suppkey")))
      val ord = QualityChecks.orphanSummary(Seq(
        ("ord_orphan_cust", Tables.orders(s, d), Tables.customer(s, d), "o_custkey", "c_custkey")))
      li.crossJoin(ord)
    }),

    // POSITIVE control for the orphan plane (r12 verdict #1): the
    // generated testdata is referentially CLEAN, so q_fk_orphan_summary
    // passes with all-zero counts — a vacuous gate that a wrong key or
    // flipped anti-join direction could not break. This variant runs the
    // SAME one-pass/anti-join functions against GHOST-KEY dims (each dim
    // truncated by a distinct modulus, the x179 pattern), so every edge
    // reports a nonzero, hash-checked orphan count; any key/direction
    // defect now lands as a hash mismatch, not a green 0 == 0.
    "q_fk_orphan_planted" -> ((s, d) => {
      val li = QualityChecks.orphanSummaryOnePass(Tables.lineitem(s, d), Seq(
        ("li_orphan_orders", Tables.orders(s, d).filter(col("o_orderkey") % 97 =!= 0),
          "l_orderkey", "o_orderkey"),
        ("li_orphan_part", Tables.part(s, d).filter(col("p_partkey") % 53 =!= 0),
          "l_partkey", "p_partkey"),
        ("li_orphan_supp", Tables.supplier(s, d).filter(col("s_suppkey") % 31 =!= 0),
          "l_suppkey", "s_suppkey")))
      val ord = QualityChecks.orphanSummary(Seq(
        ("ord_orphan_cust", Tables.orders(s, d),
          Tables.customer(s, d).filter(col("c_custkey") % 41 =!= 0),
          "o_custkey", "c_custkey")))
      li.crossJoin(ord)
    }),

    // Join-key skew profile: the ops diagnostic behind every salting
    // decision (util.Skew). Per-key row counts of the fact table's join
    // key collapse to floor(log2(count)) buckets — exact integer
    // arithmetic via the binary-string length, ≤64 result rows at any
    // scale. Run it on a key BEFORE choosing broadcast/salt/AQE-skew
    // strategies; a long tail into high buckets is the flooded-task
    // signature.
    "q_skew_profile" -> ((s, d) =>
      graft.util.Skew.keyHistogram(Tables.lineitem(s, d), "l_orderkey")),

    // k-anonymity audit — the privacy read taken before any data
    // release: group sizes over the quasi-identifier tuple
    // (segment, nation, account-balance band), collapsed to a k →
    // (groups, rows) histogram. Two map-combined aggregates; the
    // histogram is bounded by max group size, metadata-sized at any
    // corpus scale. A mass at small k is the re-identification
    // surface (rows whose QI tuple is nearly unique); the release
    // gate is "no rows below k=threshold", read directly off the
    // first histogram rows.
    "q_k_anonymity" -> ((s, d) =>
      Tables.customer(s, d)
        .select(col("c_mktsegment"), col("c_nationkey"),
          floor(col("c_acctbal") / 1000.0).cast("long").as("bal_band"))
        .groupBy("c_mktsegment", "c_nationkey", "bal_band")
        .agg(count(lit(1)).as("k"))
        .groupBy("k")
        .agg(count(lit(1)).as("n_groups"))
        .select(col("k"), col("n_groups"), (col("k") * col("n_groups")).as("n_rows"))
        .orderBy("k")),

    // l-diversity audit — the companion k-anonymity does NOT give: a
    // group can be large (k-anonymous) yet expose its members anyway
    // when every row shares the sensitive value (the homogeneity
    // attack). Per quasi-identifier group (segment, nation): size k,
    // distinct sensitive values l (the balance band doubles as the
    // sensitive attribute here), and the release verdict l ≥ 3. One
    // map-combined aggregate to the bounded QI grid (segments ×
    // nations — dimension-sized at any scale); count + distinct share
    // the exchange.
    "q_l_diversity" -> ((s, d) =>
      Tables.customer(s, d)
        .select(col("c_mktsegment"), col("c_nationkey"),
          floor(col("c_acctbal") / 1000.0).cast("long").as("bal_band"))
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(count(lit(1)).as("k"),
          countDistinct(col("bal_band")).as("l_distinct"))
        .withColumn("is_l_diverse", (col("l_distinct") >= 3).cast("int"))
        .orderBy("c_mktsegment", "c_nationkey")),

    // X180: t-closeness — completes the release-gate trio (q_k
    // k-anonymity, q_l l-diversity): l-diversity can hold while a
    // class's sensitive DISTRIBUTION still leaks (all its l values
    // clustered at the top of the range), so t-closeness bounds the
    // earth-mover's distance between each class's distribution of the
    // ORDERED sensitive attribute (balance band) and the global one.
    // For an ordered attribute EMD = Σ|cumulative difference|/(m−1)
    // (Li et al., ICDE'07); here computed EXACTLY in integers via
    // cross-multiplication — |cumc·n_g − cumg·n_c| per grid value, no
    // per-row division, so both engines agree bit-for-bit (ppm by one
    // terminal integer div; the x129 stride-guard lesson applied to
    // m=1). Scale: one class-keyed count shuffle; every later stage
    // (grid, cumulative sums, spine) runs on BOUNDED metadata — the
    // band grid (~12 values) and the class list — via triangular and
    // broadcast joins, never a corpus-wide window. Longs hold to
    // ~100× gate SF (Σterm·10⁶ vs 2⁶³); past that the fold goes
    // decimal, same switch x128 documents.
    "q_t_closeness" -> ((s, d) => {
      val qi = Tables.customer(s, d).select(
        col("c_mktsegment"), col("c_nationkey"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("band"))
      val grid = qi.groupBy("band").agg(count(lit(1)).as("g"))
        .localCheckpoint(true) // bounded: one row per band
      val gcum = grid.alias("x")
        .join(broadcast(grid.select(col("band").as("b2"), col("g").as("g2"))),
          col("b2") <= col("band"))
        .groupBy("band").agg(sum("g2").as("cumg"))
      val consts = broadcast(grid.agg(count(lit(1)).as("m"), sum("g").as("n_g")))
      val cls = qi.groupBy("c_mktsegment", "c_nationkey", "band")
        .agg(count(lit(1)).as("c"))
      val nclass = cls.groupBy("c_mktsegment", "c_nationkey")
        .agg(sum("c").as("n_c"))
      // class cumulative counts AT EVERY grid value (absent bands carry)
      val spine = cls.select("c_mktsegment", "c_nationkey").distinct()
        .crossJoin(broadcast(grid.select("band")))
      val cum = spine.alias("s")
        .join(cls.alias("t"),
          col("t.c_mktsegment") === col("s.c_mktsegment") &&
          col("t.c_nationkey") === col("s.c_nationkey") &&
          col("t.band") <= col("s.band"), "left")
        .groupBy(col("s.c_mktsegment").as("c_mktsegment"),
          col("s.c_nationkey").as("c_nationkey"), col("s.band").as("band"))
        .agg(coalesce(sum(col("t.c")), lit(0L)).as("cumc"))
      cum.join(broadcast(gcum), Seq("band"))
        .join(nclass, Seq("c_mktsegment", "c_nationkey"))
        .crossJoin(consts)
        .groupBy("c_mktsegment", "c_nationkey", "n_c", "m", "n_g")
        .agg(sum(abs(col("cumc") * col("n_g") - col("cumg") * col("n_c")))
          .as("ssum"))
        .select(col("c_mktsegment"), col("c_nationkey"), col("n_c").as("k"),
          expr("ssum * 1000000 div (greatest(m - 1, 1) * n_c * n_g)")
            .as("emd_ppm"))
        .withColumn("is_t_close", (col("emd_ppm") <= 150000).cast("int"))
        .orderBy("c_mktsegment", "c_nationkey")
    }),

    // Join-explosion guard — the pre-flight read before any
    // many-to-many join: the EXACT output cardinality of A⋈B on key k
    // is Σ_k cnt_A(k)·cnt_B(k), computable from two map-combined key
    // histograms without running the join (here the lineitem partkey
    // self-join, the x2-style inverted-index shape). Emits the top-10
    // contributing keys — the rows a rewrite (df-cap, prefix filter,
    // salt) must address — with the predicted total on every row
    // (j21's exchange-reuse shape). The guard costs one aggregate;
    // the join it predicts can cost n², which is the point.
    "q_join_explosion" -> ((s, d) => {
      val c = Tables.lineitem(s, d).groupBy("l_partkey")
        .agg(count(lit(1)).as("cnt"))
        .select(col("l_partkey"), col("cnt"), (col("cnt") * col("cnt")).as("contrib"))
      c.crossJoin(broadcast(c.agg(sum("contrib").as("predicted_total"))))
        .orderBy(desc("contrib"), col("l_partkey"))
        .limit(10)
    }),

    // Right-to-be-forgotten sweep — the multi-table cascade audit run
    // before executing a deletion batch: per table, rows before /
    // rows the cascade removes / rows after, for the deletion list
    // "customers with custkey ≡ 0 (mod 97)" cascading through
    // orders → lineitem. Scale shape: the deletion list and its order
    // set are deletion-batch-sized — both BROADCAST — so each fact
    // pays one scan with a broadcast left join and a conditional
    // count; the fact⋈fact join a naive cascade would do (lineitem
    // against ALL orders) never happens. Orphan lineitems (no parent
    // order) are untouched by design — their owner is unknown, so
    // deleting them would over-delete; j4/q_fk_orphan_summary is the
    // audit that owns them.
    "q_deletion_sweep" -> ((s, d) => {
      val del = broadcast(Tables.customer(s, d)
        .filter(col("c_custkey") % 97 === 0)
        .select(col("c_custkey").as("del_key")))
      val delOrders = broadcast(Tables.orders(s, d)
        .join(del, col("o_custkey") === col("del_key"), "left_semi")
        .select(col("o_orderkey").as("del_okey")))
      def row(name: String, df: DataFrame, deleted: Column) =
        df.agg(count(lit(1)).as("n_before"), sum(deleted.cast("long")).as("n_deleted"))
          .select(lit(name).as("table_name"), col("n_before"), col("n_deleted"),
            (col("n_before") - col("n_deleted")).as("n_after"))
      row("customer", Tables.customer(s, d), col("c_custkey") % 97 === 0)
        .union(row("orders",
          Tables.orders(s, d).join(del, col("o_custkey") === col("del_key"), "left"),
          col("del_key").isNotNull))
        .union(row("lineitem",
          Tables.lineitem(s, d)
            .join(delOrders, col("l_orderkey") === col("del_okey"), "left"),
          col("del_okey").isNotNull))
        .orderBy("table_name")
    }))

  def oracles: Map[String, String] = Map(
    "a5_null_profile" -> {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
      cols.map(c =>
        s"""SELECT '$c' AS column_name, CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
                   count(*) AS n_total,
                   CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS null_rate
            FROM lineitem""").mkString("", " UNION ALL ", " ORDER BY column_name")
    },
    "a3_volume_uniqueness" ->
      """SELECT count(*) AS total_rows, count(DISTINCT l_orderkey) AS distinct_l_orderkey,
                count(DISTINCT l_partkey) AS distinct_l_partkey,
                count(DISTINCT l_suppkey) AS distinct_l_suppkey
         FROM lineitem""",
    "a9_count_by_group" ->
      """SELECT n_name, count(*) AS n_customers FROM customer
         JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name ORDER BY n_name""",
    "q_fk_orphan_summary" ->
      """SELECT
           (SELECT count(*) FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)) AS li_orphan_orders,
           (SELECT count(*) FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey)) AS li_orphan_part,
           (SELECT count(*) FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey)) AS li_orphan_supp,
           (SELECT count(*) FROM orders WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)) AS ord_orphan_cust""",
    "q_fk_orphan_planted" ->
      """SELECT
           (SELECT count(*) FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey AND o_orderkey % 97 <> 0)) AS li_orphan_orders,
           (SELECT count(*) FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey AND p_partkey % 53 <> 0)) AS li_orphan_part,
           (SELECT count(*) FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey AND s_suppkey % 31 <> 0)) AS li_orphan_supp,
           (SELECT count(*) FROM orders WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey AND c_custkey % 41 <> 0)) AS ord_orphan_cust""",
    "q_skew_profile" ->
      """WITH kc AS (SELECT l_orderkey, count(*) AS cnt FROM lineitem GROUP BY 1),
          b AS (SELECT CAST(length(bin(cnt)) - 1 AS INT) AS log2_bucket, cnt FROM kc)
          SELECT log2_bucket, count(*) AS n_keys, min(cnt) AS min_rows,
                 max(cnt) AS max_rows, CAST(SUM(cnt) AS BIGINT) AS sum_rows
          FROM b GROUP BY 1 ORDER BY 1""",
    "q_k_anonymity" ->
      """WITH qi AS (SELECT c_mktsegment, c_nationkey,
                            CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band
                     FROM customer),
           g AS (SELECT c_mktsegment, c_nationkey, bal_band, count(*) AS k
                 FROM qi GROUP BY 1, 2, 3)
         SELECT k, count(*) AS n_groups, k * count(*) AS n_rows
         FROM g GROUP BY k ORDER BY k""",
    "q_l_diversity" ->
      """SELECT c_mktsegment, c_nationkey, count(*) AS k,
                count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT)) AS l_distinct,
                CAST(count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT)) >= 3 AS INT)
                  AS is_l_diverse
         FROM customer GROUP BY 1, 2 ORDER BY c_mktsegment, c_nationkey""",
    "q_t_closeness" ->
      """WITH qi AS (SELECT c_mktsegment AS seg, c_nationkey AS nat,
                            CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band
                     FROM customer),
           grid AS (SELECT band, COUNT(*) AS g FROM qi GROUP BY band),
           gcum AS (SELECT band, SUM(g) OVER (ORDER BY band) AS cumg FROM grid),
           consts AS (SELECT COUNT(*) AS m, SUM(g) AS n_g FROM grid),
           cls AS (SELECT seg, nat, band, COUNT(*) AS c FROM qi GROUP BY 1, 2, 3),
           nclass AS (SELECT seg, nat, SUM(c) AS n_c FROM cls GROUP BY 1, 2),
           spine AS (SELECT seg, nat, band
                     FROM (SELECT DISTINCT seg, nat FROM cls)
                     CROSS JOIN (SELECT band FROM grid)),
           cum AS (SELECT s.seg, s.nat, s.band, COALESCE(SUM(t.c), 0) AS cumc
                   FROM spine s LEFT JOIN cls t
                     ON t.seg = s.seg AND t.nat = s.nat AND t.band <= s.band
                   GROUP BY 1, 2, 3),
           terms AS (SELECT c.seg, c.nat, n.n_c, x.m, x.n_g,
                            abs(c.cumc * x.n_g - g.cumg * n.n_c) AS term
                     FROM cum c
                     JOIN gcum g USING (band)
                     JOIN nclass n ON n.seg = c.seg AND n.nat = c.nat
                     CROSS JOIN consts x)
         SELECT seg AS c_mktsegment, nat AS c_nationkey,
                CAST(n_c AS BIGINT) AS k,
                CAST(SUM(term) * 1000000
                     // (greatest(m - 1, 1) * n_c * n_g) AS BIGINT) AS emd_ppm,
                CAST(SUM(term) * 1000000
                     // (greatest(m - 1, 1) * n_c * n_g) <= 150000 AS INT) AS is_t_close
         FROM terms GROUP BY seg, nat, n_c, m, n_g
         ORDER BY c_mktsegment, c_nationkey""",
    "q_join_explosion" ->
      """WITH c AS (SELECT l_partkey, count(*) AS cnt,
                           count(*) * count(*) AS contrib
                    FROM lineitem GROUP BY l_partkey)
         SELECT l_partkey, cnt, contrib,
                (SELECT CAST(SUM(contrib) AS BIGINT) FROM c) AS predicted_total
         FROM c ORDER BY contrib DESC, l_partkey LIMIT 10""",
    // the textbook correlated-IN cascade — the engine's broadcast
    // left-join conditional counts must reproduce it exactly
    "q_deletion_sweep" ->
      """WITH del AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
           dord AS (SELECT o_orderkey FROM orders
                    WHERE o_custkey IN (SELECT c_custkey FROM del))
         SELECT * FROM (
           SELECT 'customer' AS table_name,
                  (SELECT count(*) FROM customer) AS n_before,
                  (SELECT count(*) FROM del) AS n_deleted,
                  (SELECT count(*) FROM customer) - (SELECT count(*) FROM del) AS n_after
           UNION ALL
           SELECT 'orders',
                  (SELECT count(*) FROM orders),
                  (SELECT count(*) FROM dord),
                  (SELECT count(*) FROM orders) - (SELECT count(*) FROM dord)
           UNION ALL
           SELECT 'lineitem',
                  (SELECT count(*) FROM lineitem),
                  (SELECT count(*) FROM lineitem
                   WHERE l_orderkey IN (SELECT o_orderkey FROM dord)),
                  (SELECT count(*) FROM lineitem) -
                  (SELECT count(*) FROM lineitem
                   WHERE l_orderkey IN (SELECT o_orderkey FROM dord))
         ) ORDER BY table_name""")
}
