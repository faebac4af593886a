package graft.queries

import graft.{SparkSpecBase, Tables}
import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins probe ≡ gate for the nine pair-table consumers the bench times
  * in their service shape: each gate query's result must be identical
  * when its tail runs over a parquet-persisted detector pair table
  * instead of the inline pipeline — otherwise the timed computation is
  * not the one the oracle verifies. */
class PairPlaneProbeSpec extends SparkSpecBase {

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("pair-table probes equal their gate queries through a parquet round trip") {
    val docs = Tables.documents(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("pair-plane").toString
    Dedup.minhashNearDups(docs, 0.5).write.mode("overwrite").parquet(dir + "/mh")
    Dedup.simhashNearDups(Dedup.simhashMd5(docs).cache(), maxHamming = 3, sigBits = 32)
      .write.mode("overwrite").parquet(dir + "/sh")
    val mh = spark.read.parquet(dir + "/mh")
    val sh = spark.read.parquet(dir + "/sh")

    val probes: Seq[(String, DataFrame)] = Seq(
      "x17_dedup_clusters" -> Dedup.nearDupComponents(mh, docs).orderBy("doc_id"),
      "x165_cc_lss" -> Dedup.ccLargeStarSmallStar(mh, docs)._1.orderBy("doc_id"),
      "x180_cluster_cohesion" -> TrainingData.clusterCohesion(mh, docs),
      "x38_cluster_keeper" -> Dedup.componentKeepers(
        Dedup.nearDupComponents(mh, docs),
        docs.select(col("doc_id"), length(col("text")).as("len")), "len")
        .orderBy("doc_id"),
      "x42_split_leakage" -> TrainingData.splitLeakage(mh, docs),
      "x43_component_split" -> TrainingData.componentSplit(mh, docs),
      "x70_dedup_agreement" -> TrainingData.dedupAgreement(mh, sh),
      "x75_source_overlap" -> TrainingData.sourceOverlap(mh, docs),
      "x84_dup_pagerank" -> graft.operators.PageRank.pagerankPpm(
        mh.select("doc_a", "doc_b"), docs.select("doc_id"), iters = 4)
        .orderBy("doc_id"),
      "x96_contam_spread" -> TrainingData.contamSpreadOnPairs(docs, mh),
      "x156_golden_record" -> TrainingData.goldenRecord(mh, docs),
      "x164_sssp" -> {
        TrainingData.ssspEdges(docs).write.mode("overwrite").parquet(dir + "/se")
        TrainingData.ssspOnEdges(docs, spark.read.parquet(dir + "/se"))
      },
      "x73_bloom_screen" -> {
        Dedup.docShingles(docs, n = 5).write.mode("overwrite").parquet(dir + "/sh5")
        val sh5 = spark.read.parquet(dir + "/sh5")
        graft.util.Bloom.bits(
            sh5.filter(col("doc_id") % 20 === 0).select("sh").distinct(), "sh")
          .write.mode("overwrite").parquet(dir + "/bits")
        TrainingData.bloomScreenOnPlane(docs, sh5, spark.read.parquet(dir + "/bits"))
      },
      "x97_threshold_sweep" -> mh.agg(
        count(lit(1)).as("n_050"),
        sum(when(col("jaccard") >= 0.6, 1L).otherwise(0L)).as("n_060"),
        sum(when(col("jaccard") >= 0.7, 1L).otherwise(0L)).as("n_070"),
        sum(when(col("jaccard") >= 0.8, 1L).otherwise(0L)).as("n_080"),
        sum(when(col("jaccard") >= 0.9, 1L).otherwise(0L)).as("n_090")))
    probes.foreach { case (name, probe) =>
      assert(rows(probe) === rows(TrainingData.queries(name)(spark, sfDir)),
        s"probe ≠ gate for $name")
    }
  }
}
