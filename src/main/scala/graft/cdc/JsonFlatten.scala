package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-driven recursive flattener — the intended semantics of the
  * reference's per-message dict flatten (`/root/reference/
  * mongo_postgres_cdc.py:90-112,165-197`, caps at `:61-62`), re-expressed
  * over `StructType` so one projection flattens a whole micro-batch
  * (columnar, codegen'd) instead of a Python loop per row.
  *
  * Rules (SURVEY §2.3 F15/F17):
  *   - struct fields within depth/width caps expand to `parent_child` columns;
  *   - structs deeper than `maxDepth` or wider than `maxKeys` serialize to
  *     a JSON string;
  *   - arrays/maps always serialize to a JSON string (warehouse stays scalar).
  */
object JsonFlatten {

  val DefaultMaxDepth = 2
  val DefaultMaxKeys  = 5

  def flatten(df: DataFrame,
              maxDepth: Int = DefaultMaxDepth,
              maxKeys: Int = DefaultMaxKeys): DataFrame =
    df.select(flattenColumns(df.schema, maxDepth, maxKeys): _*)

  /** Pure schema → projection list; one pass, no per-row interpretation. */
  def flattenColumns(schema: StructType, maxDepth: Int, maxKeys: Int): Seq[Column] = {
    def ref(path: Seq[String]): Column = col(path.map(p => s"`$p`").mkString("."))
    def walk(dt: DataType, path: Seq[String], depth: Int): Seq[Column] = {
      val name = path.mkString("_")
      dt match {
        case st: StructType if depth < maxDepth && st.fields.length <= maxKeys =>
          st.fields.toSeq.flatMap(f => walk(f.dataType, path :+ f.name, depth + 1))
        case _: StructType | _: ArrayType | _: MapType =>
          Seq(to_json(ref(path)).as(name))
        case _ => Seq(ref(path).as(name))
      }
    }
    schema.fields.toSeq.flatMap(f => walk(f.dataType, Seq(f.name), 0))
  }
}
