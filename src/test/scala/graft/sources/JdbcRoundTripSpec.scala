package graft.sources

import graft.SparkSpecBase
import graft.Tables
import org.apache.spark.sql.functions._

/** Live JDBC round trip against embedded Derby (ships with Spark):
  * S1 pushed-down watermark lookup, S2 partitioned read, K1 append,
  * K2 idempotent upsert. */
class JdbcRoundTripSpec extends SparkSpecBase {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def exec(sqls: String*): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try sqls.foreach { s =>
      val st = conn.createStatement()
      try st.execute(s) catch { case e: java.sql.SQLException if e.getSQLState == "X0Y32" => }
      st.close()
    } finally conn.close()
  }

  test("K1 append + S2 read + S1 pushed-down max round-trip") {
    val src = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("amount"))
    JdbcSink.append(src, url, "orders_wh")
    // S2: full read back
    val back = JdbcSource.read(spark, url, "orders_wh")
    assert(back.count() === src.count())
    // S1: watermark computed database-side, one row over the wire
    // (identifier quoted: Spark's JDBC writer creates case-sensitive names)
    val hwm = JdbcSource.readMax(spark, url, "orders_wh", "\"k\"").first().getLong(0)
    assert(hwm === src.agg(max("k")).first().getLong(0))
    // S2 partitioned: same rows, multiple input partitions
    val part = JdbcSource.read(spark, url, "orders_wh",
      partitionColumn = Some("\"k\""), lowerBound = 0L, upperBound = hwm + 1, numPartitions = 4)
    assert(part.rdd.getNumPartitions === 4)
    assert(part.count() === src.count())
  }

  test("K2 upsert is idempotent and last-write-wins") {
    exec("CREATE TABLE kv (pk BIGINT PRIMARY KEY, name VARCHAR(128), val DOUBLE)")
    val v1 = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("pk", "name", "val")
    JdbcSink.upsert(v1, url, "kv", "pk")
    // replay the same batch (at-least-once delivery) + a new version of pk 2
    JdbcSink.upsert(v1, url, "kv", "pk")
    val v2 = Seq((2L, "b2", 20.0), (3L, "c", 3.0)).toDF("pk", "name", "val")
    JdbcSink.upsert(v2, url, "kv", "pk")
    val got = JdbcSource.read(spark, url, "kv")
      .orderBy("pk").as[(Long, String, Double)].collect().toSeq
    assert(got === Seq((1L, "a", 1.0), (2L, "b2", 20.0), (3L, "c", 3.0)))
  }

  test("K2 upsert survives duplicate pks within one chunk") {
    exec("CREATE TABLE kv_dup (pk BIGINT PRIMARY KEY, name VARCHAR(128), val DOUBLE)")
    // two fresh rows with the same pk in ONE partition and ONE JDBC
    // chunk: both would read update-count 0 in the batched UPDATE and
    // both INSERT — a PK violation without the within-chunk keep-last
    val dup = Seq((7L, "first", 1.0), (7L, "last", 2.0), (8L, "x", 3.0))
      .toDF("pk", "name", "val").coalesce(1)
    JdbcSink.upsert(dup, url, "kv_dup", "pk")
    val got = JdbcSource.read(spark, url, "kv_dup")
      .orderBy("pk").as[(Long, String, Double)].collect().toSeq
    assert(got === Seq((7L, "last", 2.0), (8L, "x", 3.0)))
  }
}
