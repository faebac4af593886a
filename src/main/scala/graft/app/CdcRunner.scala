package graft.app

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType
import graft.sources.{JdbcSink, JdbcSql}
import graft.streaming.CdcStream

/** Streaming CDC entry point — the production wiring of the plane the
  * reference ran as a single-threaded kafka-python loop
  * (`/root/reference/mongo_postgres_cdc.py:429-476`):
  *
  *   spark-submit ... graft.app.CdcRunner \
  *     <bootstrap> <topic> <payloadSchemaDDL> <jdbcUrl> <checkpointDir>
  *
  * Kafka source (earliest offsets, bounded per trigger) → parse/flatten/
  * normalize/key ([[CdcStream.transform]]) → per-batch last-write-wins
  * dedup → idempotent JDBC upsert. Checkpointed offsets + idempotent
  * merge ⇒ effectively-once (SURVEY §2.7 T2); the reference was
  * at-least-once. Table DDL is created lazily from the first batch's
  * schema ([[JdbcSql.createTableSql]]), with `ALTER TABLE ADD COLUMN`
  * evolution the reference lacked (SURVEY §8.10).
  */
object CdcRunner {

  /** JDBC-backed sink: lazy DDL + portable upsert per micro-batch. */
  class JdbcUpsertSink(url: String, table: String) extends CdcStream.UpsertSink {
    @transient private var created = false
    override def merge(batch: org.apache.spark.sql.DataFrame, pkCol: String): Unit = {
      if (!created) {
        val conn = java.sql.DriverManager.getConnection(url)
        try JdbcSql.createTableSql(table, batch.schema).foreach { ddl =>
          val st = conn.createStatement()
          try st.execute(ddl) catch { case _: java.sql.SQLException => () }
          st.close()
        } finally conn.close()
        created = true
      }
      JdbcSink.upsert(batch, url, table, pkCol)
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(bootstrap, topic, schemaDdl, jdbcUrl, checkpointDir) = args.take(5)
    val spark = SparkSession.builder()
      .appName("graft-cdc")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    val source = CdcStream.kafkaSource(spark, bootstrap, topic)
    val table = CdcStream.routeTable(topic)
    // T7: poison rows land in <table>_quarantine instead of failing the
    // micro-batch; counters surface merged/quarantined totals.
    val counters = CdcStream.newCounters(spark)
    val query = CdcStream.run(
      source, StructType.fromDDL(schemaDdl), topic,
      new JdbcUpsertSink(jdbcUrl, table), checkpointDir,
      deadLetter = Some(new JdbcUpsertSink(jdbcUrl, s"${table}_quarantine")),
      counters = Some(counters)).start()
    // T6 (`mongo_postgres_cdc.py:403-412` intent): SIGTERM/SIGINT stop
    // the query cleanly — the in-flight micro-batch finishes and offsets
    // commit, so restart resumes exactly after the last completed batch.
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      try query.stop()
      catch { case _: Exception => () }
      System.err.println(
        s"[graft-cdc] stopped: merged=${counters.merged.value} quarantined=${counters.quarantined.value}")
    }))
    query.awaitTermination()
  }
}
