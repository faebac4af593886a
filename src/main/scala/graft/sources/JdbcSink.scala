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
  * matched — used from `foreachBatch`. Within-chunk duplicate pks
  * collapse keep-last before batching, so the public K2 API is safe on
  * un-deduped input; callers that care WHICH duplicate wins should
  * still dedup deliberately first (CdcStream does, last-write-wins by
  * source offset — partition-internal order here is plan-dependent),
  * and per-pk uniqueness is what makes replays idempotent (T2).
  */
object JdbcSink {

  /** K1: partition-parallel append (auto-creates the table if absent). */
  def append(df: DataFrame, url: String, table: String,
             props: Map[String, String] = Map.empty): Unit =
    df.write.mode(SaveMode.Append).format("jdbc")
      .option("url", url).option("dbtable", table).options(props).save()

  /** Identifier allow-list: table/column names reach the SQL text by
    * interpolation (JDBC can't parameterize identifiers), so anything
    * outside `[A-Za-z_][A-Za-z0-9_]*` (dot-qualified for tables) is
    * rejected before a statement is built — CDC-derived names (topic →
    * table) go through NameNormalizer first; this is the backstop. */
  private[sources] def checkIdent(name: String): String = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*(\\.[A-Za-z_][A-Za-z0-9_]*)*"),
      s"unsafe SQL identifier: $name")
    name
  }

  /** K2: idempotent upsert — UPDATE-first, INSERT the misses — executed
    * in JDBC batches per partition (one round trip per `batchSize` rows,
    * not per row). `executeBatch` update counts identify the misses;
    * drivers that return SUCCESS_NO_INFO re-run those rows one by one.
    * Duplicate pks WITHIN one chunk collapse to the last occurrence
    * first: two same-pk rows in a single batched UPDATE would both read
    * update-count 0 against a missing row and both INSERT — a PK
    * violation the old row-by-row path never hit. (Across chunks the
    * statements execute in order, so a later chunk's UPDATE correctly
    * hits the earlier chunk's INSERT.) */
  def upsert(df: DataFrame, url: String, table: String, pk: String,
             batchSize: Int = 500): Unit = {
    val cols = df.columns.toSeq
    (table +: cols).foreach(checkIdent)
    require(cols.contains(pk), s"pk column $pk not in ${cols.mkString(",")}")
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
          try {
            def bindUpdate(r: Row): Unit = {
              nonPk.zipWithIndex.foreach { case (c, i) => up.setObject(i + 1, r.getAs[AnyRef](c)) }
              up.setObject(nonPk.size + 1, r.getAs[AnyRef](pk))
            }
            def bindInsert(r: Row): Unit =
              cols.zipWithIndex.foreach { case (c, i) => ins.setObject(i + 1, r.getAs[AnyRef](c)) }
            rows.grouped(batchSize).foreach { rawChunk =>
              // keep-last per pk within the chunk (insertion-ordered map:
              // position of first occurrence, value of last — order is
              // immaterial once pks are unique)
              val byPk = scala.collection.mutable.LinkedHashMap.empty[AnyRef, Row]
              rawChunk.foreach(r => byPk(r.getAs[AnyRef](pk)) = r)
              val chunk = byPk.values.toSeq
              chunk.foreach { r => bindUpdate(r); up.addBatch() }
              val counts = up.executeBatch()
              var anyInsert = false
              chunk.iterator.zip(counts.iterator).foreach {
                case (r, 0) => bindInsert(r); ins.addBatch(); anyInsert = true
                case (r, java.sql.Statement.SUCCESS_NO_INFO) =>
                  bindUpdate(r)
                  if (up.executeUpdate() == 0) { bindInsert(r); ins.addBatch(); anyInsert = true }
                case _ => ()
              }
              if (anyInsert) ins.executeBatch()
            }
            conn.commit()
          } finally { up.close(); ins.close() }
        } finally conn.close()
      }
    }
  }
}
