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

  test("temperatureWeights computes exact sqrt-compressed ppm weights on a 16:4:1 skew") {
    // counts 400:100:25 => sqrt 20:10:5 => q shares 4:2:1 — every ppm
    // value is hand-computable because the arithmetic is fixed-point
    val rows = (1L to 400L).map(i => (i, "en")) ++
      (401L to 500L).map(i => (i, "de")) ++
      (501L to 525L).map(i => (i, "fr"))
    val got = Sampling.temperatureWeights(rows.toDF("id", "dom"), "dom")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // s: 20e6 / 10e6 / 5e6, stot = 35e6, total = 525
    assert(got("en") === ((400L, 761904L, 571428L, 571428L * 525 / 400)))
    assert(got("de") === ((100L, 190476L, 285714L, 285714L * 525 / 100)))
    assert(got("fr") === ((25L, 47619L, 142857L, 142857L * 525 / 25)))
    // head is downsampled, tail upsampled; q ordering still follows p
    assert(got("en")._4 < 1000000L && got("de")._4 > 1000000L && got("fr")._4 > 1000000L)
    assert(got("en")._3 > got("de")._3 && got("de")._3 > got("fr")._3)
    // q shares are a distribution (floor loses < 1 ppm per domain)
    val qSum = got.values.map(_._3).sum
    assert(qSum > 1000000L - 3 && qSum <= 1000000L)
  }

  test("temperatureWeights with equal domains is the identity mix (weight = 1e6)") {
    val rows = (1L to 300L).map(i => (i, s"d${i % 3}"))
    val got = Sampling.temperatureWeights(rows.toDF("id", "dom"), "dom")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.length === 3)
    got.foreach { r =>
      assert(r._3 === 333333L && r._4 === 333333L)
      assert(r._5 === 999999L) // 333333 ppm of 300 over 100 docs: floor artifacts only
    }
  }

  test("applyMixWeights materializes whole copies plus a deterministic fractional draw") {
    // 1600:100 => sqrt 40:10 => q 0.8:0.2 => weights 0.85:3.4 —
    // rare domain gets 3 whole copies + 40% chance of a 4th
    val rows = (1L to 1600L).map(i => (i, "big")) ++ (10001L to 10100L).map(i => (i, "rare"))
    val df = rows.toDF("id", "dom")
    val out = Sampling.applyMixWeights(df, "dom", "id").cache()
    val w = Sampling.temperatureWeights(df, "dom")
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r._5).toMap
    // every rare doc appears floor(w) or floor(w)+1 times; big docs 0 or 1
    val perDoc = out.groupBy("id", "domain").count().as[(Long, String, Long)].collect()
    perDoc.foreach { case (_, dom, n) =>
      val base = w(dom) / 1000000L
      assert(n === base || n === base + 1, s"$dom doc replicated $n times, weight ${w(dom)}")
    }
    // realized totals track the expected mix within a few percent
    val counts = out.groupBy("domain").count().as[(String, Long)].collect().toMap
    val expBig = 1600L * w("big") / 1000000L
    val expRare = 100L * w("rare") / 1000000L
    assert(math.abs(counts("big") - expBig) < expBig / 10)
    assert(math.abs(counts("rare") - expRare) < expRare / 10 + 5)
    // copy_idx is dense 1..n per doc
    val badIdx = out.groupBy("id").agg(count(lit(1)).as("n"), max("copy_idx").as("m"))
      .filter($"n" =!= $"m").count()
    assert(badIdx === 0)
    // deterministic on rerun
    val again = Sampling.applyMixWeights(df, "dom", "id")
    assert(out.except(again).count() === 0 && again.except(out).count() === 0)
  }
}
