package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. 2007) — community
  * detection over an edge table, the relational sibling of the dedup
  * plane's connected components (`dedup/Dedup.ccLargeStarSmallStar`).
  * CC answers "which nodes are REACHABLE"; LPA answers "which nodes
  * cluster DENSELY" — a bridge edge joins two components but rarely
  * flips a community, which is why near-dup audit stacks want both.
  *
  * Determinism (the property the async textbook variant lacks): rounds
  * are synchronous — every node updates from the PREVIOUS round's
  * labels — and the mode tie-break is total (neighbor-label count desc,
  * then min label), so the result is a pure function of the edge set
  * and round count, reproducible on any engine. The DuckDB oracle
  * unrolls the same rounds verbatim.
  *
  * Scale shape: each round is one edge⋈label equi-join (labels shuffle
  * on node id — high-cardinality), one (node, label) map-combined
  * count, and one node-partitioned top-1 window; work is O(rounds·|E|)
  * with no global structure. Labels are eagerly localCheckpoint'd per
  * round — the CC discipline: the logical plan would otherwise double
  * every round and AQE would replan the whole history each iteration.
  * Fixed small round counts are the production norm (LPA converges in
  * a handful of sweeps; oscillation, not divergence, is the failure
  * mode — a caller wanting convergence detection compares successive
  * label frames, the ccLargeStarSmallStar fixpoint pattern).
  */
object LabelPropagation {

  /** `edges` carries one row per undirected edge as (src, dst); both
    * orientations are derived here. Every endpoint is a node; initial
    * label = own id. Returns (node, lbl) after `rounds` sweeps. */
  def run(edges: DataFrame, rounds: Int): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
    var labels = und.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint(true)
    val top = Window.partitionBy("node").orderBy(desc("cnt"), asc("lbl"))
    for (_ <- 1 to rounds) {
      labels = und
        .join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src").as("node"), col("lbl"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(top))
        .filter(col("rn") === 1)
        .select("node", "lbl")
        .localCheckpoint(true)
    }
    labels
  }
}
