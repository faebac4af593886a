package graft.plans

import graft.SparkSpecBase

/** Whole-surface generalization of the WindowScaleSafetySpec ban: NO
  * query on the SparkEntry surface may plan an un-partitioned Window —
  * the one plan shape guaranteed to funnel the corpus through a single
  * task at 100 TB. Every new query is linted automatically the moment
  * it is registered; a regression to a global rank/running-sum shape
  * fails here by name.
  *
  * Exemptions, by documented design: the TopFrac histogram-refinement
  * queries, whose single un-partitioned Window runs over the
  * METADATA-SIZED coarse histogram (≤ score-range/coarseDiv rows),
  * never the corpus — see util/TopFrac.scala and the r8 verdict note.
  */
class SurfaceWindowLintSpec extends SparkSpecBase {

  private val exempt = Set(
    // TopFrac histogram refinement: the un-partitioned Window runs over
    // the ≤ range/coarseDiv-row coarse histogram, never the corpus
    "x52_quality_cut", "x77_quality_deciles",
    "x112_rfm_segments", // three TopFrac.tiles calls (same histogram shape)
    "x117_quantile_norm", // TopFrac.tiles + groupTiles (histogram shape)
    // bounded-grid ECDF / day-grid cumulations: the Window input is the
    // distinct-value grid (n_chars values / event days), metadata-sized
    // at any corpus scale — the x113-oracle "dense grid" design
    "x113_ks_drift",
    "x121_survival_hazard",
    // skyline suffix-max: the Window input is the (w, max q) grid —
    // bounded by the distinct token-count range, metadata-sized
    "x142_skyline",
    // periodic snapshot: the cumulative window runs over the per-month
    // delta aggregate — the bounded month grid, never the corpus
    "x145_periodic_snapshot",
    // mini-dimension: the surrogate-rank window runs over the DISTINCT
    // (band, segment, region) combo table — bands × segments × regions
    // bounded metadata at any corpus size
    "x151_minidim",
    // dedup horizon: the cumulative window runs over the FIVE-row gap-
    // bucket grid (the x145 month-grid shape)
    "x174_dedup_horizon",
    // equi-depth histogram: GroupedQuantiles partitions its windows by
    // the group key, but the single-group call uses a LITERAL group —
    // constant-folded out of partitionSpec — and the window input is
    // the metadata-sized coarse histogram (≤ range/coarseDiv rows),
    // the TopFrac exemption class
    "x176_equidepth_hist",
    // largest-remainder apportionment: the remainder-rank window runs
    // over the NATIONS-grain share table (25 rows — the fact collapsed
    // map-combined to nation grain in its only shuffle), metadata-sized
    // at any corpus scale
    "x196_lr_allocation",
    // lateness curve: the un-partitioned prefix-max window runs over
    // the HOUR-GRID bucket maxima (the x113/x121 bounded-grid class);
    // the per-event running max is partitioned by that hour bucket
    "x203_lateness_curve",
    // Zipf rank-bucket profile: both un-partitioned windows ride the
    // (frequency, #types) HISTOGRAM (distinct frequency VALUES — the
    // statistics-sized table, never types or tokens) and the ≤40-row
    // bucket table; no per-type rank is ever computed — see
    // CorpusStats.zipfProfile (the x118/TopFrac exemption class)
    "x212_zipf_profile",
    // sorted-shard audit: the rank itself is ScalableRank's two-phase
    // bucket-partitioned form (linted green); the only un-partitioned
    // window is the boundary-quality lag over the 32-row zones table
    // — shards-sized metadata at any corpus scale (util.SortedLayout)
    "x217_sorted_shards")

  /** Columns whose cardinality is bounded by the DOMAIN, not the data:
    * a Window partitioned ONLY by these puts a corpus-scale fraction in
    * one task — the x168 hot-block straggler generalized (its fix:
    * ScalableRank.groupedRowNumber sub-splits the group). */
  private val lowCardinality = Set(
    "lang", "source", "event_type", "o_orderstatus", "l_returnflag",
    "l_linestatus", "c_mktsegment", "o_orderpriority", "l_shipmode",
    "n_name", "r_name", "verdict", "split", "blk")

  /** Audited exemptions: every window here is group-keyed but its INPUT
    * is bounded by construction, so the per-group partition never holds
    * a corpus fraction. */
  /** ONE traversal of the whole surface: building every gate query is
    * expensive (the streaming end-to-end rows each run a real
    * multi-micro-batch lifecycle just to construct their read-back
    * frame), so both lints below read this shared per-query Window
    * collection instead of invoking the registry twice. */
  private lazy val surfaceWindows: Seq[(String, Seq[org.apache.spark.sql.catalyst.plans.logical.Window])] =
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => exempt(q._1))
      .map { case (n, fn) =>
        val wins =
          try fn(spark, sfDir).queryExecution.optimizedPlan.collect {
            case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
          } catch {
            case e: Throwable => fail(s"$n failed to plan: ${e.getMessage}")
          }
        n -> wins
      }

  private val hotKeyExempt: Set[String] = Set(
    // GroupedQuantiles/GroupedMedian histogram refinement: the group-
    // keyed windows run over the (group × coarse-bucket) COUNT table
    // (≤ range/coarseDiv rows per group), never corpus rows
    "a17_percentiles", "x115_mad_spread",
    // daily-grain anomaly family: the fact collapses map-combined to
    // the (type, day) grid in its only shuffle; the rolling-3σ / CUSUM
    // windows run over that bounded grid (§6.1 row)
    "x100_rolling_anomaly", "x105_cusum_shift",
    // two-phase salted quota: the source-only window ranks the SALTED
    // SURVIVORS (≤ salts·quota = 240 rows per source by construction —
    // Sampling.domainQuota), not the corpus
    "x37_domain_quota")

  test("no surface query windows on ONLY low-cardinality keys (hot-key straggler lint)") {
    val offenders = surfaceWindows
      .filterNot(q => hotKeyExempt(q._1))
      .flatMap { case (n, wins) =>
        val bad = wins.collect {
          case w if w.partitionSpec.nonEmpty && {
              val names = w.partitionSpec.flatMap(_.references.toSeq).map(_.name)
              names.nonEmpty && names.forall(lowCardinality)
            } => w.partitionSpec.flatMap(_.references.toSeq).map(_.name).distinct
        }
        if (bad.nonEmpty) Some(s"$n[${bad.map(_.mkString("+")).mkString(";")}]") else None
      }
    spark.catalog.clearCache()
    assert(offenders.isEmpty,
      s"Window partitioned only by domain-bounded keys (one task holds a corpus " +
        s"fraction at 100 TB; sub-split via ScalableRank.groupedRowNumber or " +
        s"exempt with justification): ${offenders.mkString(", ")}")
  }

  test("no surface query plans an un-partitioned Window (TopFrac histogram exemptions aside)") {
    val offenders = surfaceWindows
      .collect { case (n, wins) if wins.exists(_.partitionSpec.isEmpty) => n }
    spark.catalog.clearCache()
    assert(offenders.isEmpty,
      s"un-partitioned corpus Window planned by: ${offenders.mkString(", ")}")
  }
}
