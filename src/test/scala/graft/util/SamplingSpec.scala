package graft.util

import graft.SparkSpecBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpecBase {
  import spark.implicits._

  test("domainQuota equals the single-window rank on a skewed key distribution") {
    // one mega-key (900 rows), a key at exactly the quota boundary, and
    // a tiny key — the shapes the two-phase plan must all get right
    val rows = (1L to 900L).map(i => (i, "big")) ++
      (901L to 915L).map(i => (i, "edge")) ++
      (916L to 918L).map(i => (i, "small"))
    val df = rows.toDF("id", "dom")

    val got = Sampling.domainQuota(df, "dom", "id", quota = 15)
      .select("id", "dom", "rnk")

    val w = Window.partitionBy("dom").orderBy(md5($"id".cast("string")), $"id")
    val want = df.withColumn("rnk", row_number().over(w).cast("int"))
      .filter($"rnk" <= 15)
      .select("id", "dom", "rnk")

    assert(got.except(want).count() === 0)
    assert(want.except(got).count() === 0)
    // the quota binds: exactly 15 per capped key, the tiny key intact
    val counts = got.groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(counts === Map("big" -> 15L, "edge" -> 15L, "small" -> 3L))
  }

  test("tokenBudgetMix resolves per-stratum cuts from the data and applies them deterministically") {
    // two strata: 'big' holds 10x the budget in tokens, 'small' fits inside it
    val rows = (1L to 1000L).map(i => (i, "big", 10L)) ++
      (2001L to 2050L).map(i => (i, "small", 4L))
    val df = rows.toDF("id", "lang", "nt")
    val kept = Sampling.tokenBudgetMix(df, "lang", "id", $"nt", budgetTokens = 1000L)
      .cache()
    // small stratum total (200) <= budget => cut 256 => all 50 rows kept
    assert(kept.filter($"lang" === "small").count() === 50)
    // big stratum: cut = floor(256*1000/10000) = 25 => ~25/256 of rows kept;
    // md5 buckets are uniform, so the kept count lands near 1000*25/256 ~ 98
    val bigKept = kept.filter($"lang" === "big").count()
    assert(bigKept > 50 && bigKept < 160, s"kept $bigKept of 1000")
    // deterministic: the same budget keeps the same rows on a rerun
    val again = Sampling.tokenBudgetMix(df, "lang", "id", $"nt", budgetTokens = 1000L)
    assert(kept.select("id").except(again.select("id")).count() === 0)
    assert(again.select("id").except(kept.select("id")).count() === 0)
  }

  test("domainQuota phase-1 slices bound every window partition by the salt split") {
    // with 16 salts, no (key, salt) slice of the mega-key holds more
    // than ~1/16 of it (md5 nibbles are uniform) — the property that
    // keeps the per-task sort bounded no matter how big one key gets
    val df = (1L to 2000L).map(i => (i, "mega")).toDF("id", "dom")
    val sliceSizes = df
      .withColumn("rk", md5($"id".cast("string")))
      .withColumn("salt", conv(substring($"rk", 32, 1), 16, 10).cast("int"))
      .groupBy("salt").count().as[(Int, Long)].collect()
    assert(sliceSizes.length === 16)
    assert(sliceSizes.map(_._2).max < 2000 / 16 * 2, "salt split should be near-uniform")
  }
}
