package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, TimestampType}

/** Epoch-magnitude timestamp detection — the intended semantics of
  * `/root/reference/mongo_postgres_cdc.py:144-156` (SURVEY §2.3 F13):
  * an integer in [1e9, 1e10) is epoch seconds, [1e12, 1e13) is epoch
  * millis, anything else is not a timestamp (NULL).
  *
  * Implemented as a native Catalyst `Expression` with `doGenCode` so the
  * branchy range check stays inside WholeStageCodegen (no UDF
  * serialization, no codegen fallback) — the preferred extension tier
  * for scalar functions (SURVEY §7).
  */
case class SmartTimestamp(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true
  override def prettyName: String = "smart_timestamp"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[Long]
    if (x >= SmartTimestamp.SecLo && x < SmartTimestamp.SecHi) x * 1000000L
    else if (x >= SmartTimestamp.MsLo && x < SmartTimestamp.MsHi) x * 1000L
    else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |if ($c >= ${SmartTimestamp.SecLo}L && $c < ${SmartTimestamp.SecHi}L) {
      |  ${ev.value} = $c * 1000000L;
      |} else if ($c >= ${SmartTimestamp.MsLo}L && $c < ${SmartTimestamp.MsHi}L) {
      |  ${ev.value} = $c * 1000L;
      |} else {
      |  ${ev.isNull} = true;
      |}""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): SmartTimestamp =
    copy(child = newChild)
}

object SmartTimestamp {
  val SecLo = 1000000000L      // 1e9  — 2001-09-09
  val SecHi = 10000000000L     // 1e10
  val MsLo  = 1000000000000L   // 1e12
  val MsHi  = 10000000000000L  // 1e13

  /** Column API; integral inputs are cast to long before detection. */
  def smart_timestamp(c: Column): Column =
    GraftBridge.column(SmartTimestamp(Cast(GraftBridge.expression(c), LongType)))

  /** SQL registration so `spark.sql("SELECT smart_timestamp(x) …")` works. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "smart_timestamp", exprs => SmartTimestamp(Cast(exprs.head, LongType)), "built-in")
}
