package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SaveMode}

/** JDBC sink executors — SURVEY §2.1 K1/K2.
  *
  * [[append]] is the reference's warehouse load
  * (`/root/reference/spark_etl.py:160-166`): every executor partition
  * opens its own connection, so a 1000-executor load fans out instead of
  * funneling through the driver.
  *
  * [[upsert]] is the runtime half of the CDC merge (K2): the SQL-string
  * half lives in [[JdbcSql]] (Postgres `ON CONFLICT`); this executor is
  * the dialect-portable fallback — UPDATE first, INSERT when no row
  * matched — used from `foreachBatch`. Callers must dedup the batch by
  * pk first (CdcStream does, last-write-wins): rows within one batch
  * race otherwise, and per-pk uniqueness is what makes replays
  * idempotent (T2 effectively-once).
  */
object JdbcSink {

  /** K1: partition-parallel append (auto-creates the table if absent). */
  def append(df: DataFrame, url: String, table: String,
             props: Map[String, String] = Map.empty): Unit =
    df.write.mode(SaveMode.Append).format("jdbc")
      .option("url", url).option("dbtable", table).options(props).save()

  /** K2: idempotent per-row upsert, batched per partition. */
  def upsert(df: DataFrame, url: String, table: String, pk: String): Unit = {
    val cols = df.columns.toSeq
    val nonPk = cols.filterNot(_ == pk)
    val updateSql = s"UPDATE $table SET ${nonPk.map(c => s"$c = ?").mkString(", ")} WHERE $pk = ?"
    val insertSql = s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})"
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val up = conn.prepareStatement(updateSql)
          val ins = conn.prepareStatement(insertSql)
          rows.foreach { r =>
            nonPk.zipWithIndex.foreach { case (c, i) => up.setObject(i + 1, r.getAs[AnyRef](c)) }
            up.setObject(nonPk.size + 1, r.getAs[AnyRef](pk))
            if (up.executeUpdate() == 0) {
              cols.zipWithIndex.foreach { case (c, i) => ins.setObject(i + 1, r.getAs[AnyRef](c)) }
              ins.executeUpdate()
            }
          }
          conn.commit()
        } finally conn.close()
      }
    }
  }
}
