package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.StructType

/** As-of join (point-in-time lookup): for every left row, the payload of
  * the *latest* right row with rightTime ≤ leftTime on the same key.
  *
  * The reference has no as-of joins; a warehouse grows them the moment
  * facts need "the dimension value as of the event" (SURVEY §2.4 note).
  * Composition, not a custom SparkStrategy (builder guidance: compose
  * existing ops when semantics allow): tag both sides, union, and take a
  * running `last(payload, ignoreNulls)` over (key, time) — ONE shuffle
  * and sort per key, linear in |L|+|R|. The naive alternative — a range
  * join `l.t >= r.t` + argmax — explodes to |L|·|R| rows per key before
  * pruning; this version never materializes a pair.
  *
  * Right side must be unique per (key, time) — pre-dedup (the equal-time
  * right row sorts before left rows, so `>=` is inclusive like SQL ASOF).
  */
object AsofJoin {

  def asofLeft(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    val lStructType = StructType(left.schema.fields)
    val rStructType = StructType(right.select(payload.map(col): _*).schema.fields)
    val l2 = left.select(
      col(key).as("__k"), col(leftTime).as("__t"), lit(1).as("__is_left"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rStructType).as("__p"))
    val r2 = right.select(
      col(key).as("__k"), col(rightTime).as("__t"), lit(0).as("__is_left"),
      lit(null).cast(lStructType).as("__l"),
      struct(payload.map(col): _*).as("__p"))
    val w = Window.partitionBy("__k").orderBy("__t", "__is_left")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = l2.unionByName(r2)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
    merged.select(
      left.columns.map(c => col(s"__l.$c").as(c)) ++
        payload.map(p => col(s"__asof.$p").as(s"asof_$p")): _*)
  }
}
