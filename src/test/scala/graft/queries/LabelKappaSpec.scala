package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins for x91 Cohen's kappa (values under the oracle hash-gate):
  * formula consistency on the real run, and the two calibration
  * anchors every kappa implementation must hit — perfect agreement
  * → 1.0, a constant predictor → 0.0 (chance-corrected away). */
class LabelKappaSpec extends SparkSpecBase {
  import spark.implicits._

  private def kappaOf(pairs: Seq[(Int, Int)]): (Long, Long, Double) = {
    // the same integer-ppm chain the query applies, over (label, pred)
    val pred = pairs.toDF("label", "pred_label")
    val tot = pred.agg(count(lit(1)).as("n"),
      sum(when(col("label") === col("pred_label"), 1L).otherwise(0L)).as("n_match"))
    val rm = pred.groupBy("label").agg(count(lit(1)).as("r"))
    val cm = pred.groupBy(col("pred_label").as("label")).agg(count(lit(1)).as("c"))
    val pe = rm.join(cm, Seq("label"))
      .crossJoin(broadcast(tot.select("n")))
      .select(expr("((r * 1000000 div n) * (c * 1000000 div n)) div 1000000").as("pc"))
      .agg(coalesce(sum("pc"), lit(0L)).as("pe_ppm"))
    val r = tot.crossJoin(broadcast(pe))
      .select(expr("n_match * 1000000 div n").as("po_ppm"), col("pe_ppm"),
        ((expr("n_match * 1000000 div n") - col("pe_ppm")).cast("double") /
          (lit(1000000L) - col("pe_ppm")).cast("double")).as("kappa"))
      .head()
    (r.getLong(0), r.getLong(1), r.getDouble(2))
  }

  test("perfect agreement gives kappa 1; a constant predictor gives kappa 0") {
    val (po1, _, k1) = kappaOf(Seq((0, 0), (1, 1), (2, 2), (0, 0), (1, 1), (2, 2)))
    assert(po1 === 1000000L && k1 === 1.0)
    // constant predictor over a 50/50 label split: po = pe = 0.5 → 0
    val (_, _, k0) = kappaOf(Seq((0, 0), (0, 0), (1, 0), (1, 0)))
    assert(k0 === 0.0, s"constant predictor must be chance-corrected to 0, got $k0")
  }

  test("the gate row is internally consistent and bounded") {
    val r = TrainingData.queries("x91_label_kappa")(spark, sfDir).collect().head
    val po = r.getAs[Long]("po_ppm"); val pe = r.getAs[Long]("pe_ppm")
    val kappa = r.getAs[Double]("kappa")
    assert(po >= 0 && po <= 1000000L && pe >= 0 && pe < 1000000L)
    assert(kappa === (po - pe).toDouble / (1000000L - pe).toDouble)
    assert(kappa <= 1.0 && kappa >= -1.0)
    assert(r.getAs[Long]("n_match") <= r.getAs[Long]("n"))
  }
}
