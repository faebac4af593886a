package graft.quality

import graft.{SparkSpecBase, Tables}
import graft.queries.Quality
import org.apache.spark.sql.functions._

/** Pins q_t_closeness's invariants beyond the DuckDB hash gate: the
  * integer EMD agrees with an independent floating-point computation
  * of the Li et al. definition, the value is a true [0,1] distance in
  * ppm, and every (k-anonymity) class appears exactly once.
  */
class TClosenessSpec extends SparkSpecBase {

  test("integer EMD matches the floating-point definition per class") {
    val out = Quality.queries("q_t_closeness")(spark, sfDir)
      .select("c_mktsegment", "c_nationkey", "emd_ppm").collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getLong(2))).toMap
    // independent reference: per-class and global distributions as
    // doubles, EMD = Σ|cum(p) − cum(q)| / (m − 1)
    val rows = Tables.customer(spark, sfDir)
      .select(col("c_mktsegment"), col("c_nationkey"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("band"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val bands = rows.map(_._3).distinct.sorted
    val m = bands.length
    val nG = rows.length.toDouble
    val gCum = bands.map(b => rows.count(_._3 <= b) / nG)
    rows.groupBy(r => (r._1, r._2)).foreach { case (cls, members) =>
      val nC = members.length.toDouble
      val cCum = bands.map(b => members.count(_._3 <= b) / nC)
      val emd = cCum.zip(gCum).map { case (p, q) => math.abs(p - q) }.sum /
        math.max(m - 1, 1)
      val ppm = out(cls)
      assert(math.abs(ppm - emd * 1e6) <= 1.0,
        s"class $cls: integer ppm $ppm vs reference ${emd * 1e6}")
    }
    assert(out.size === rows.map(r => (r._1, r._2)).distinct.size)
  }

  test("emd_ppm is a bounded distance and the flag is its thresholding") {
    val bad = Quality.queries("q_t_closeness")(spark, sfDir)
      .filter(col("emd_ppm") < 0 || col("emd_ppm") > 1000000 ||
        col("is_t_close") =!= (col("emd_ppm") <= 150000).cast("int"))
    assert(bad.count() === 0L)
  }
}
