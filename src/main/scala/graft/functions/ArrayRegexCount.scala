package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Count the elements of a string array that FULLY match a regex — the
  * predicate-count generalization of [[MarkerHits]] (set membership →
  * regex match).
  *
  * The Column form `size(filter(t, _.rlike(...)))` is a higher-order
  * function: interpreted per row, per element, outside whole-stage
  * codegen — the same family of blowups fixed for x19/x7/x8 in round 4
  * (SURVEY §2.7a hot-path lessons). This expression compiles the
  * pattern ONCE (a codegen reference object), walks the array in one
  * loop, and participates in WholeStageCodegen via `doGenCode`.
  *
  * Anchoring follows `Matcher.matches()` (whole-element match), i.e.
  * `regexp_full_match` in DuckDB terms — pass an unanchored pattern.
  * Null array ⇒ null; null elements are skipped.
  */
case class ArrayRegexCount(child: Expression, regex: String) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "array_regex_count"

  @transient private lazy val pattern: Pattern = Pattern.compile(regex)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    var n = 0
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i) && pattern.matcher(arr.getUTF8String(i).toString).matches()) n += 1
      i += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patRef = ctx.addReferenceObj("arcPattern", pattern, "java.util.regex.Pattern")
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |int $n = 0;
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if (!$arr.isNullAt($i) &&
         |      $patRef.matcher($arr.getUTF8String($i).toString()).matches()) $n++;
         |}
         |${ev.value} = $n;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ArrayRegexCount =
    copy(child = newChild)
}

object ArrayRegexCount {
  /** Column API: count of `tok` elements fully matching `regex`. */
  def array_regex_count(tok: Column, regex: String): Column =
    GraftBridge.column(ArrayRegexCount(GraftBridge.expression(tok), regex))
}
