package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

class JdbcSqlSpec extends AnyFunSuite {

  private val schema = StructType.fromDDL(
    "kafka_primary_key STRING, name STRING, amount DOUBLE, n BIGINT, ok BOOLEAN, ts TIMESTAMP")

  test("K3 DDL: metadata columns, pk, and two indexes") {
    val stmts = JdbcSql.createTableSql("loan_events", schema)
    assert(stmts.length == 3)
    val ddl = stmts.head
    assert(ddl.contains("CREATE TABLE IF NOT EXISTS loan_events"))
    assert(ddl.contains("kafka_primary_key TEXT PRIMARY KEY"))
    assert(ddl.contains("amount DOUBLE PRECISION") && ddl.contains("n BIGINT")
      && ddl.contains("ok BOOLEAN") && ddl.contains("ts TIMESTAMP"))
    assert(ddl.contains("raw_data JSONB") && ddl.contains("processed_at TIMESTAMP DEFAULT now()"))
    assert(stmts(1).contains("idx_loan_events_topic") && stmts(2).contains("idx_loan_events_processed"))
  }

  test("K2 upsert: ON CONFLICT DO UPDATE on every non-pk column") {
    val sql = JdbcSql.upsertSql("t", Seq("kafka_primary_key", "a", "b"), "kafka_primary_key")
    assert(sql == "INSERT INTO t (kafka_primary_key, a, b) VALUES (?, ?, ?) " +
      "ON CONFLICT (kafka_primary_key) DO UPDATE SET a = EXCLUDED.a, b = EXCLUDED.b, " +
      "updated_at = now()")
  }

  test("schema evolution: ALTER TABLE ADD COLUMN IF NOT EXISTS") {
    val stmts = JdbcSql.alterAddColumnsSql("t",
      Seq(StructField("extra", IntegerType), StructField("note", StringType)))
    assert(stmts == Seq(
      "ALTER TABLE t ADD COLUMN IF NOT EXISTS extra INT",
      "ALTER TABLE t ADD COLUMN IF NOT EXISTS note TEXT"))
  }
}
