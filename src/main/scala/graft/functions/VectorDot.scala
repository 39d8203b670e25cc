package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * The similarity operators score millions of candidate pairs; a
  * higher-order-function pipeline (`aggregate(zip_with(...))`) evaluates a
  * lambda per ELEMENT through interpreted expression trees, which is the
  * hot-path cost at scale. This expression keeps whole-stage codegen intact
  * (real `doGenCode`, not `CodegenFallback`) and reduces each pair score to
  * one static-method call over Tungsten array data — a tight primitive loop
  * the JIT vectorizes, with zero boxing and zero per-element dispatch.
  *
  * Accumulation is a sequential left-to-right fold, bit-identical to the
  * `aggregate()` formulation it replaces, so oracle comparisons at
  * basis-point rounding are unaffected.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes is off the table (AbstractDataType is private[sql]);
  // enforce array<double> inputs directly. graft.functions.vecDot inserts
  // the casts, so user code never trips this.
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"VectorDot requires array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** Unit-normalization as ONE native expression: a materialized-norm
  * formulation is defeated by CollapseProject, which re-inlines a
  * single-use norm alias into the per-element division lambda — O(d²) per
  * row again (verified in the optimized plan). One expression, one pass,
  * nothing for the optimizer to duplicate. NULL result for zero-norm
  * vectors (callers filter). */
case class VectorNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"VectorNormalize requires array<double>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any): Any =
    VectorOps.normalize(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.VectorOps.normalize($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): VectorNormalize =
    copy(child = newChild)
}

object VectorOps {
  /** Sequential fold over the common prefix; elements must be non-null
    * (embedding vectors never carry null elements). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** Unit-normalize in ONE traversal pair (norm fold + scale); null for
    * zero-norm vectors (no direction). Accumulation order matches
    * `dot(a, a)` so results are bit-identical to sqrt(dot)+divide. */
  def normalize(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = a.getDouble(i); s += x * x; i += 1 }
    if (s == 0.0) return null
    val norm = math.sqrt(s)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = a.getDouble(i) / norm; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
