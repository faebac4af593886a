package graft.streaming

import graft.SparkSpecBase
import graft.app.CdcRunner
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types.StructType

/** Full CDC plane end to end: MemoryStream JSON → parse/flatten/
  * normalize/key → per-batch dedup → [[CdcRunner.JdbcUpsertSink]] into
  * embedded Derby — the production sink shape against a real database,
  * with replay idempotence. */
class CdcJdbcEndToEndSpec extends SparkSpecBase {

  private val url = "jdbc:derby:memory:graftcdc;create=true"
  private val payloadSchema = StructType.fromDDL("id BIGINT, name STRING, amount DOUBLE")

  private def query[A](sql: String)(f: java.sql.ResultSet => A): A = {
    val conn = java.sql.DriverManager.getConnection(url)
    try { val rs = conn.createStatement().executeQuery(sql); f(rs) }
    finally conn.close()
  }

  test("stream → JDBC upsert lands in the database and replays idempotently") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the generated DDL is Postgres-flavored (JSONB, now()); on Derby the
    // sink's lazy-DDL attempt fails closed and the pre-created table wins
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().execute(
      """CREATE TABLE loan_events (
           raw_data VARCHAR(1024), id BIGINT, name VARCHAR(128), amount DOUBLE,
           kafka_primary_key VARCHAR(64) PRIMARY KEY, kafka_topic VARCHAR(128),
           processed_at TIMESTAMP)""")
    catch { case e: java.sql.SQLException if e.getSQLState == "X0Y32" => }
    finally conn.close()

    val input = MemoryStream[String]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdc_e2e").toString
    val q = CdcStream.run(
      input.toDF().withColumnRenamed("value", "json"),
      payloadSchema, "mongo.loan_applications",
      new CdcRunner.JdbcUpsertSink(url, "loan_events"), ckpt).start()
    try {
      input.addData(
        """{"id": 1, "name": "a", "amount": 10.0}""",
        """{"id": 2, "name": "b", "amount": 20.0}""")
      q.processAllAvailable()
      assert(query("SELECT count(*) FROM loan_events")(r => { r.next(); r.getLong(1) }) === 2L)

      // replay + newer version of pk 1 within one batch → LWW, still 2 rows
      input.addData(
        """{"id": 1, "name": "a2", "amount": 11.0}""",
        """{"id": 1, "name": "a3", "amount": 12.0}""")
      q.processAllAvailable()
      assert(query("SELECT count(*) FROM loan_events")(r => { r.next(); r.getLong(1) }) === 2L)
      val (name, topic) = query(
        "SELECT name, kafka_topic FROM loan_events WHERE kafka_primary_key = '1'") { r =>
        r.next(); (r.getString(1), r.getString(2))
      }
      assert(name === "a3")
      assert(topic === "mongo.loan_applications")
    } finally q.stop()
  }
}
