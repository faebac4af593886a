package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Count, for each of N word lists, how many elements of a token array
  * belong to it (duplicates counted) — returns an N-element int array.
  *
  * The language-ID / quality path (`TextFunctions.withTextSignals`,
  * intended semantics of the builder prompt's text-analysis extensions)
  * needs SIX such counts per row (five language marker lists + the
  * combined stopword list). As Column expressions those are six
  * `size(filter(tok, isin(...)))` higher-order functions: HOFs are
  * interpreted (no whole-stage codegen participation) and each one
  * walks the array separately. This native expression makes ONE pass
  * over the array, testing each token against all N hash sets, and
  * `doGenCode` keeps it inside WholeStageCodegen — the preferred
  * extension tier for scalar functions (SURVEY §7), same shape as
  * [[SmartTimestamp]].
  *
  * Null array ⇒ null; null elements are skipped (the upstream
  * tokenizer never produces them).
  */
case class MarkerHits(child: Expression, lists: Seq[Seq[String]]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "marker_hits"

  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    lists.map { words =>
      val s = new java.util.HashSet[UTF8String](words.size * 2)
      words.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val counts = new Array[Int](lists.length)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        var j = 0
        while (j < counts.length) {
          if (sets(j).contains(t)) counts(j) += 1
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("markerSets", sets, "java.util.HashSet[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      s"""
         |int[] $counts = new int[${lists.length}];
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $t = $arr.getUTF8String($i);
         |    for (int $j = 0; $j < ${lists.length}; $j++) {
         |      if ($setsRef[$j].contains($t)) $counts[$j]++;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($counts);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MarkerHits =
    copy(child = newChild)
}

object MarkerHits {
  /** Column API: `marker_hits(tok, lists)(j)` = hit count for list j. */
  def marker_hits(tok: Column, lists: Seq[Seq[String]]): Column =
    GraftBridge.column(MarkerHits(GraftBridge.expression(tok), lists))
}
