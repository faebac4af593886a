package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact fixed-point dot product of two `Array[Float]` columns in ONE
  * codegen'd pass: each element quantizes to round(v·10⁶) as a long
  * (Spark's `round` = HALF_UP on `BigDecimal.valueOf`, reproduced here
  * literally so results are bit-identical to the Column form
  * `aggregate(zip_with(a, b, q(x)·q(y)), 0L, +)`), products and sums
  * stay integer — order-independent, engine-reproducible.
  *
  * Why native: the HOF form is the per-ROW hot path of every
  * similarity/norm computation (`Similarity.norms` runs it over the
  * whole vector plane), and Spark's higher-order functions are
  * interpreted — `zip_with` materializes an intermediate array and
  * `aggregate` runs a lambda per element outside whole-stage codegen.
  * This expression is the SURVEY §7 preferred tier (native Expression
  * with `doGenCode`, the [[MarkerHits]]/[[SmartTimestamp]] shape): one
  * fused loop, no intermediate array, inside WholeStageCodegen.
  *
  * Null semantics mirror the HOF chain exactly: null array ⇒ null;
  * mismatched lengths ⇒ null (zip_with pads with nulls, which a sum
  * absorbs to null); any null element ⇒ null.
  */
case class FixedPointDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "fixed_point_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += FixedPointDot.q(a.getFloat(i)) * FixedPointDot.q(b.getFloat(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val cls = "graft.functions.FixedPointDot"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $acc += $cls.q($a.getFloat($i)) * $cls.q($b.getFloat($i));
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FixedPointDot =
    copy(left = newLeft, right = newRight)
}

/** Per-element fixed-point quantization of an `Array[Float]` column:
  * round(v·10⁶) as `Array[Long]`, one codegen'd loop — the native form
  * of `transform(arr, x => round(x·10⁶)::long)` (HOF lambdas are
  * interpreted), used by the element-join layout every bulk dot
  * product explodes from. Null array ⇒ null; null elements propagate
  * as null elements (the transform semantics). */
case class FixedPointQuantize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = true)
  override def prettyName: String = "fixed_point_quantize"

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) out(i) = FixedPointDot.q(a.getFloat(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $out[$i] = graft.functions.FixedPointDot.q($a.getFloat($i));
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FixedPointQuantize =
    copy(child = newChild)
}

object FixedPointQuantize {
  /** Column API: quantized long array of a float-array column. */
  def fixed_point_quantize(a: Column): Column =
    GraftBridge.column(FixedPointQuantize(GraftBridge.expression(a)))
}

object FixedPointDot {
  /** round(v·10⁶) with Spark's exact Round semantics for doubles —
    * HALF_UP over `BigDecimal.valueOf`'s shortest-decimal repr — in
    * plain exact float arithmetic (no BigDecimal/Double.toString per
    * element). Equivalence: (a) a shortest-decimal ".5" tie exists iff
    * the double is EXACTLY k.5 (any other decimal near k.5 would parse
    * to the representable k.5, not round-trip), so the away-from-zero
    * branch fires in precisely the same cases; (b) off ties, the
    * shortest decimal sits on the same side of k.5 as the binary value
    * (decimals on the far side parse to k.5 or beyond), so the rounded
    * integer agrees; (c) `ad - floor(ad)` is exact for |ad| < 2⁵²
    * (the fraction's significand is a suffix of ad's). Called from
    * generated code. */
  def q(v: Float): Long = {
    val d = v.toDouble * 1e6
    val ad = math.abs(d)
    val fl = math.floor(ad)
    val r = if (ad - fl >= 0.5d) fl.toLong + 1L else fl.toLong
    if (d < 0) -r else r
  }

  /** Column API: exact fixed-point dot of two float-array columns. */
  def fixed_point_dot(a: Column, b: Column): Column =
    GraftBridge.column(FixedPointDot(GraftBridge.expression(a), GraftBridge.expression(b)))
}
