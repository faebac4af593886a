package graft.cdc

import org.apache.spark.sql.DataFrame

/** Column-name normalization + conflict renaming — intended semantics of
  * `/root/reference/mongo_postgres_cdc.py:216-224` (clean) and `:311-332`
  * (collision/reserved rename), as a pure schema pass (SURVEY §2.3 F18/F20).
  */
object NameNormalizer {

  /** Names that would collide with the sink's metadata/reserved columns
    * (`mongo_postgres_cdc.py:260-265` adds these to every landing table). */
  val Reserved: Set[String] =
    Set("raw_data", "kafka_topic", "kafka_primary_key", "processed_at",
        "updated_at", "primary_key", "select", "from", "where", "table",
        "group", "order")

  /** F18: lowercase; `-`/`.`/space → `_`; strip other non-alphanumerics;
    * digit-leading names get a `col_` prefix; empty → `col`. */
  def normalize(name: String): String = {
    val cleaned = name.toLowerCase
      .replaceAll("[-. ]", "_")
      .replaceAll("[^a-z0-9_]", "")
    val nonEmpty = if (cleaned.isEmpty) "col" else cleaned
    if (nonEmpty.head.isDigit) s"col_$nonEmpty" else nonEmpty
  }

  /** F18 + F20 over a whole schema: normalize every name, then suffix
    * `_1, _2, …` on collisions (first occurrence keeps the bare name
    * unless it is reserved, in which case it is suffixed immediately). */
  def normalizeAll(names: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.Set.empty[String]
    names.map { raw =>
      val base = normalize(raw)
      val candidate0 = if (Reserved.contains(base)) s"${base}_1" else base
      var candidate = candidate0
      var i = if (Reserved.contains(base)) 1 else 0
      while (seen.contains(candidate)) {
        i += 1
        candidate = s"${base}_$i"
      }
      seen += candidate
      candidate
    }
  }

  def apply(df: DataFrame): DataFrame = df.toDF(normalizeAll(df.columns.toSeq): _*)
}
