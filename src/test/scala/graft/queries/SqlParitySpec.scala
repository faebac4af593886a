package graft.queries

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.DataFrame

/** SURVEY §3.3: the Dataset API and the `spark.sql` entry point must
  * produce identical results over the same catalog. */
class SqlParitySpec extends SparkSpecBase {

  private def assertSame(api: DataFrame, sql: String): Unit = {
    Tables.registerAll(spark, sfDir)
    val viaSql = spark.sql(sql)
    assert(api.schema.fieldNames.sorted.sameElements(viaSql.schema.fieldNames.sorted))
    assert(api.exceptAll(viaSql).count() === 0)
    assert(viaSql.exceptAll(api).count() === 0)
  }

  test("star rollup: Dataset API == spark.sql") {
    assertSame(
      Relational.queries("j2_star3_rollup")(spark, sfDir),
      """SELECT c_mktsegment, year(o_orderdate) AS order_year, l_returnflag,
                count(*) AS n_lines,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                CAST(SUM(CAST(l_extendedprice * (1.0d - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                       JOIN customer ON o_custkey = c_custkey
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")
  }

  test("dim-fact join: Dataset API == spark.sql") {
    assertSame(
      Relational.queries("j1_dim_fact_join")(spark, sfDir),
      """SELECT c_mktsegment, count(*) AS n_orders,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""")
  }

  test("segment aggregate: Dataset API == spark.sql") {
    assertSame(
      Relational.queries("a6_sum_avg_by_seg")(spark, sfDir),
      """SELECT c_mktsegment, count(*) AS n,
                CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(c_acctbal) AS avg_bal
         FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""")
  }
}
