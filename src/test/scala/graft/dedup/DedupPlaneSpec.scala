package graft.dedup

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.DataFrame

class DedupPlaneSpec extends SparkSpecBase {

  private def asSet(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("plane consumers are bit-identical to the self-contained query paths") {
    val docs = Tables.documents(spark, sfDir)
    val plane = DedupPlane.build(docs)
    try {
      assert(asSet(plane.pairs) === asSet(Dedup.minhashNearDups(docs)))
      assert(asSet(plane.components()) ===
        asSet(Dedup.nearDupComponents(Dedup.minhashNearDups(docs), docs)))
      assert(asSet(plane.accuracy) === asSet(Dedup.minhashAccuracy(docs)))
    } finally plane.unpersist()
  }

  test("build caches the shared stages; unpersist leaves the CacheManager empty") {
    spark.catalog.clearCache()
    val plane = DedupPlane.build(Tables.documents(spark, sfDir))
    // materialize the deepest consumer — every shared stage fills
    plane.pairs.count()
    assert(!spark.sharedState.cacheManager.isEmpty)
    plane.unpersist()
    assert(spark.sharedState.cacheManager.isEmpty,
      "a released plane must not leak storage in a long-running service")
  }
}
