package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Primary-key extraction for CDC landing — intended semantics of
  * `/root/reference/mongo_postgres_cdc.py:199-214` (SURVEY §2.3 F19):
  * first of the well-known id fields, else any `*id` column, else a
  * deterministic row fingerprint so the upsert key is never null.
  */
object PkExtractor {

  val Candidates: Seq[String] = Seq("_id", "id", "uuid", "key", "pk", "objectid")

  /** The column name chosen as primary key, if any. Internal transport
    * columns (`__graft_*`: raw payload, source partition/offset) are
    * never key candidates. */
  def pkColumn(columns: Seq[String]): Option[String] = {
    val payload = columns.filterNot(_.startsWith("__graft"))
    val lower = payload.map(c => c.toLowerCase -> c).toMap
    Candidates.collectFirst { case c if lower.contains(c) => lower(c) }
      .orElse(payload.find(_.toLowerCase.endsWith("id")))
  }

  /** Attach `kafka_primary_key` (string-typed, as the reference's landing
    * DDL declares it — `mongo_postgres_cdc.py:260`). Falls back to an
    * md5 fingerprint of the payload columns for key-less rows — transport
    * metadata (source offsets) stays out of the fingerprint, or replayed
    * messages would mint fresh keys and break upsert idempotence. */
  def withPrimaryKey(df: DataFrame): DataFrame = {
    val payloadCols = df.columns.toSeq.filterNot(c =>
      c.startsWith("__graft") && c != "__graft_raw")
    val fingerprint = md5(to_json(struct(payloadCols.map(col): _*)))
    // coalesce keeps the key non-null even when the id FIELD is null
    // (e.g. a parse-failed payload) — the upsert key must never be null
    val key: Column = pkColumn(df.columns.toSeq) match {
      case Some(c) => coalesce(col(c).cast("string"), fingerprint)
      case None    => fingerprint
    }
    df.withColumn("kafka_primary_key", key)
  }
}
