package graft.plans

import graft.SparkSpecBase
import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the PK-FK join-elimination contract (X163):
  *   1. an inner fact⋈dim with declared uniqueness + referential
  *      integrity and no dim column used drops the dim scan, values
  *      unchanged (the gate's oracle hash proves this at gate SFs;
  *      here value-compared in-process);
  *   2. a LEFT join eliminates with uniqueness alone (no RI needed);
  *   3. blocked when: a dim column is used; the inner join has no
  *      declared RI; the join is non-equi.
  */
class JoinElimSpec extends SparkSpecBase {

  private def relCount(df: DataFrame): Int =
    df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }.size

  test("inner join with declared RI drops the dim; values unchanged") {
    val li = Tables.lineitem(spark, sfDir)
    val p = Tables.part(spark, sfDir)
    val c = JoinElim.constraint(p, "p_partkey", referential = true)
    val q = li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sq"), count(lit(1)).as("n"))
    val routed = JoinElim(spark, q, Seq(c))
    assert(relCount(routed) == 1, "dim scan must be eliminated")
    assert(routed.orderBy("l_returnflag").collect().map(_.toString).toSeq ==
      q.orderBy("l_returnflag").collect().map(_.toString).toSeq)
  }

  test("left join eliminates with uniqueness alone") {
    val li = Tables.lineitem(spark, sfDir)
    val p = Tables.part(spark, sfDir)
    val c = JoinElim.constraint(p, "p_partkey", referential = false)
    val q = li.join(p, li("l_partkey") === p("p_partkey"), "left")
      .groupBy("l_linestatus").agg(count(lit(1)).as("n"))
    val routed = JoinElim(spark, q, Seq(c))
    assert(relCount(routed) == 1)
    assert(routed.orderBy("l_linestatus").collect().map(_.toString).toSeq ==
      q.orderBy("l_linestatus").collect().map(_.toString).toSeq)
  }

  test("blocked: dim column used / inner without RI / non-equi condition") {
    val li = Tables.lineitem(spark, sfDir)
    val p = Tables.part(spark, sfDir)
    val ri = JoinElim.constraint(p, "p_partkey", referential = true)
    val noRi = JoinElim.constraint(p, "p_partkey", referential = false)

    val usesDim = li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy("p_brand").agg(count(lit(1)).as("n"))
    assert(relCount(JoinElim(spark, usesDim, Seq(ri))) == 2,
      "a used dim column must block elimination")

    val innerNoRi = li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    assert(relCount(JoinElim(spark, innerNoRi, Seq(noRi))) == 2,
      "an inner join without declared referential integrity must not eliminate")

    val nonEqui = li.join(p, li("l_partkey") > p("p_partkey"))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    assert(relCount(JoinElim(spark, nonEqui, Seq(ri))) == 2,
      "a non-equi join must not eliminate")
  }

  test("inferred isnotnull(pk) on the dim is peeled; any other dim filter blocks") {
    val li = Tables.lineitem(spark, sfDir)
    val p = Tables.part(spark, sfDir)
    val c = JoinElim.constraint(p, "p_partkey", referential = false)
    // the optimizer-shaped dim side (InferFiltersFromConstraints wraps
    // the join key in isnotnull before the user-rule batch runs) —
    // null PKs never equi-match, so elimination stays sound
    val wrapped = li.join(p.filter(col("p_partkey").isNotNull),
        li("l_partkey") === p("p_partkey"), "left")
      .groupBy("l_linestatus").agg(count(lit(1)).as("n"))
    assert(relCount(JoinElim(spark, wrapped, Seq(c))) == 1,
      "isnotnull(pk) wrap must not block elimination")
    // a genuine narrowing filter changes left-join semantics (rows
    // lose their match) — must block
    val narrowed = li.join(p.filter(col("p_partkey") > 100),
        li("l_partkey") === p("p_partkey"), "left")
      .groupBy("l_linestatus").agg(count(lit(1)).as("n"))
    assert(relCount(JoinElim(spark, narrowed, Seq(c))) == 2,
      "a narrowing dim filter must block elimination")
  }
}
