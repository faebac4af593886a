package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recursive hierarchy closure — the warehouse bridge-table builder
  * (SURVEY §2.7a X159). Org charts, BOMs, category trees: every
  * dimension with a parent pointer eventually needs (node → root,
  * depth) to roll facts up the tree, which SQL expresses as a
  * recursive CTE (the oracle form) and Spark has no operator for.
  *
  * Pointer doubling, not level-by-level descent: each round joins the
  * state to itself (`up(v) ← up(up(v))`, distances add), so a chain of
  * depth D resolves in ⌈log₂ D⌉ rounds instead of D — at 100 TB the
  * difference between 5 and 10 000 shuffles for a deep BOM. Each round
  * is one node-sized self-join (shuffle on the `up` key);
  * `localCheckpoint` truncates lineage per round exactly like the
  * fixpoint-CC discipline (`dedup/Dedup.scala` nearDupComponentsFixpoint).
  */
object Hierarchy {

  /** `nodes`: one row per node with `idCol` and nullable `parentCol`
    * (null ⇒ root). Returns (id, root, depth); `maxDepth` bounds the
    * doubling rounds (⌈log₂ maxDepth⌉ + 1). */
  def closure(nodes: DataFrame, idCol: String, parentCol: String,
              maxDepth: Int = 4096): DataFrame = {
    val rounds = math.max(1, 32 - Integer.numberOfLeadingZeros(maxDepth - 1)) + 1
    var state = nodes.select(
        col(idCol).cast("long").as("id"),
        coalesce(col(parentCol).cast("long"), col(idCol).cast("long")).as("up"),
        when(col(parentCol).isNull, 0L).otherwise(1L).as("d"),
        col(parentCol).isNull.as("done"))
      .localCheckpoint(eager = true)
    for (_ <- 1 to rounds) {
      val s = state.as("s")
      val t = state.as("t")
      val next = s.join(t, col("s.up") === col("t.id"))
        .select(
          col("s.id").as("id"),
          when(col("s.done"), col("s.up")).otherwise(col("t.up")).as("up"),
          when(col("s.done"), col("s.d")).otherwise(col("s.d") + col("t.d")).as("d"),
          (col("s.done") || col("t.done")).as("done"))
        .localCheckpoint(eager = true)
      state.unpersist()
      state = next
    }
    val out = state.select(col("id"), col("up").as("root"), col("d").as("depth"))
      .localCheckpoint(eager = true)
    state.unpersist()
    out
  }
}
