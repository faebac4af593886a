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

  /** The column name chosen as primary key, if any. */
  def pkColumn(columns: Seq[String]): Option[String] = {
    val lower = columns.map(c => c.toLowerCase -> c).toMap
    Candidates.collectFirst { case c if lower.contains(c) => lower(c) }
      .orElse(columns.find(_.toLowerCase.endsWith("id")))
  }

  /** Attach `kafka_primary_key` (string-typed, as the reference's landing
    * DDL declares it — `mongo_postgres_cdc.py:260`). Falls back to an
    * md5 fingerprint of the whole row for key-less payloads. */
  def withPrimaryKey(df: DataFrame): DataFrame = {
    val key: Column = pkColumn(df.columns.toSeq) match {
      case Some(c) => col(c).cast("string")
      case None    => md5(to_json(struct(df.columns.map(col).toSeq: _*)))
    }
    df.withColumn("kafka_primary_key", key)
  }
}
