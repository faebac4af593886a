package graft.operators

import org.apache.spark.sql.DataFrame

/** Plan-fingerprint result cache — the warehouse RESULT CACHE face
  * (Snowflake/BigQuery-style repeated-dashboard serving): a query's
  * identity is the md5 of its CANONICALIZED analyzed plan (exprIds
  * normalized, literals kept — two independently-built DataFrames over
  * the same source with the same shape key identically; any literal or
  * column change misses). A hit serves the eagerly-materialized prior
  * result without touching the source; a miss materializes via eager
  * `localCheckpoint` (at scale: a parquet result store keyed the same
  * way, with source-snapshot validity attached — the fingerprint is
  * the hard part and is what this component pins).
  *
  * The cache is deliberately tiny infrastructure: correctness rests
  * entirely on the fingerprint, which [[ResultCacheSpec]] probes from
  * both sides (independent builds of the same query HIT; a changed
  * literal, a changed column set, and a different source path all
  * MISS). `lastHit` exposes the decision so gates can `require()` the
  * path they claim to measure.
  */
object ResultCache {

  private val store =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  @volatile var lastHit: Boolean = false

  /** Stable plan fingerprint: md5 over the canonicalized analyzed
    * plan's tree string (exprIds normalized by canonicalization, so
    * independent builds of the same logical query collide — the
    * point). */
  def fingerprint(df: DataFrame): String = {
    val canon = df.queryExecution.analyzed.canonicalized.toString
    java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Serve `df` through the cache: hit returns the stored materialized
    * result; miss materializes (eager localCheckpoint) and stores. */
  def through(df: DataFrame): DataFrame = {
    val k = fingerprint(df)
    val cached = store.get(k)
    if (cached != null) { lastHit = true; cached }
    else {
      lastHit = false
      val m = df.localCheckpoint(eager = true)
      store.put(k, m)
      m
    }
  }

  def size: Int = store.size
  def clear(): Unit = store.clear()
}
