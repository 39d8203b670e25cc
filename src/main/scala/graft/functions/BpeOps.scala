package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

/** One BPE merge-rule application (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units"): every non-overlapping
  * adjacent occurrence of (left, right) in the symbol sequence becomes
  * the concatenated symbol, scanning greedily left to right.
  *
  * Greedy equivalence note (the oracle mirrors this with a DuckDB
  * `list_reduce` whose accumulator re-checks its LAST element): the two
  * formulations are provably identical — after a merge the loop resumes
  * two positions on, while the fold would re-consider (merged, next),
  * which can only match if merged == left, i.e. left+right == left —
  * impossible for a non-empty right. All comparisons are exact byte
  * equality; no floating point anywhere in the tokenizer family.
  */
object BpeOps {
  def applyMerge(syms: ArrayData, left: UTF8String, right: UTF8String,
      merged: UTF8String): ArrayData = {
    val n = syms.numElements()
    val out = new Array[AnyRef](n)
    var o = 0
    var i = 0
    while (i < n) {
      if (i + 1 < n && left.equals(syms.getUTF8String(i)) &&
          right.equals(syms.getUTF8String(i + 1))) {
        out(o) = merged
        i += 2
      } else {
        out(o) = syms.getUTF8String(i)
        i += 1
      }
      o += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, o): Array[AnyRef])
  }

  /** Apply an entire learned merge table in order — the fused serving
    * kernel. Each rule is [left, right, merged]. Early-exits once the
    * word is a single symbol (no rule can apply). */
  def applyAll(syms: ArrayData, rules: Array[Array[UTF8String]]): ArrayData = {
    var cur = syms
    var i = 0
    while (i < rules.length && cur.numElements() >= 2) {
      cur = applyMerge(cur, rules(i)(0), rules(i)(1), rules(i)(2))
      i += 1
    }
    cur
  }
}

/** [[BpeOps.applyMerge]] as a native map-only expression — the merge rule
  * (a plan-time constant: the driver just collected the winning pair) is
  * carried in the constructor, so each BPE iteration rewrites the
  * vocabulary-sized symbol table in the scan's own stage with zero
  * shuffle and zero per-element lambda dispatch. */
case class BpeMergeApply(child: Expression, left: String, right: String)
    extends UnaryExpression {
  require(left.nonEmpty && right.nonEmpty, "BPE merge symbols must be non-empty")

  @transient private lazy val l = UTF8String.fromString(left)
  @transient private lazy val r = UTF8String.fromString(right)
  @transient private lazy val m = UTF8String.fromString(left + right)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"BpeMergeApply requires array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    BpeOps.applyMerge(v.asInstanceOf[ArrayData], l, r, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeLeft", l, "org.apache.spark.unsafe.types.UTF8String")
    val rRef = ctx.addReferenceObj("bpeRight", r, "org.apache.spark.unsafe.types.UTF8String")
    val mRef = ctx.addReferenceObj("bpeMerged", m, "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeOps.applyMerge($c, $lRef, $rRef, $mRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergeApply =
    copy(child = newChild)
}

/** An ENTIRE learned merge table applied to one word's symbol array —
  * the serving form at real merge budgets: one expression call instead
  * of |rules| chained transforms (a 30k-rule unroll would blow the
  * expression tree and codegen method limits); the rule table rides as
  * a codegen reference object, exactly the codebook device of
  * [[NearestCentroids]]. Spec-asserted equal to the chained
  * [[BpeMergeApply]] form on random corpora. */
case class BpeApplyRules(child: Expression, rules: Seq[(String, String)])
    extends UnaryExpression {
  require(rules.forall(r => r._1.nonEmpty && r._2.nonEmpty),
    "BPE merge symbols must be non-empty")

  @transient private lazy val table: Array[Array[UTF8String]] =
    rules.map(r => Array(UTF8String.fromString(r._1),
      UTF8String.fromString(r._2), UTF8String.fromString(r._1 + r._2))).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"BpeApplyRules requires array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    BpeOps.applyAll(v.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("bpeRuleTable", table,
      "org.apache.spark.unsafe.types.UTF8String[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeOps.applyAll($c, $t)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApplyRules =
    copy(child = newChild)
}
