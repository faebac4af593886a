package graft.queries

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions._

/** Pins for the x87/x88/x89 stats-family operators (values are under
  * the oracle hash-gate): distribution completeness, LOCF carry
  * semantics, and histogram tiling. */
class StatsOpsSpec extends SparkSpecBase {

  test("x87: digit shares partition the rows; ppm sums to ~1e6") {
    val rows = Relational.queries("x87_benford_audit")(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("digit")).toSet.subsetOf((1 to 9).toSet))
    val n = Tables.orders(spark, sfDir).filter(col("o_totalprice") >= 1.0).count()
    assert(rows.map(_.getAs[Long]("n_obs")).sum === n)
    val ppmSum = rows.map(_.getAs[Long]("obs_ppm")).sum
    // floor-ppm loses < 1 ppm per digit
    assert(ppmSum > 1000000L - 9 && ppmSum <= 1000000L)
  }

  test("x88: locf carries the most recent observation and leaves lead-in days null") {
    val out = Relational.queries("x88_locf_impute")(spark, sfDir).collect()
    val byCust = out.groupBy(_.getAs[Long]("o_custkey"))
    byCust.foreach { case (_, days) =>
      var carried: Option[Double] = None
      days.sortBy(_.getAs[java.sql.Date]("day").toString).foreach { r =>
        if (!r.isNullAt(r.fieldIndex("day_price")))
          carried = Some(r.getAs[Double]("day_price"))
        carried match {
          case Some(v) => assert(r.getAs[Double]("locf_price") === v, s"carry broken: $r")
          case None => assert(r.isNullAt(r.fieldIndex("locf_price")), s"lead-in not null: $r")
        }
      }
    }
  }

  test("x89: buckets tile [min,max] and counts partition the fact") {
    val rows = Relational.queries("x89_histogram")(spark, sfDir).collect()
    val n = Tables.lineitem(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum === n)
    val sorted = rows.sortBy(_.getAs[Long]("bucket"))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("bucket") < b.getAs[Long]("bucket"))
        // edges are a contiguous tiling (same arithmetic ⇒ exact equality)
        assert(a.getAs[Double]("hi_edge") === b.getAs[Double]("lo_edge")
          || a.getAs[Long]("bucket") + 1 != b.getAs[Long]("bucket"))
      case _ =>
    }
  }
}
