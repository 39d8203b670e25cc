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

/** Signed-random-projection signature as ONE native expression: all
  * `planes.length` (≤64) hyperplane dot products over the vector in a
  * single codegen'd pass, bit b set when v·plane_b > 0 (MSB-first fold
  * order, bit-identical to the `aggregate(shiftleft|bitwiseOR)` HOF
  * formulation it replaces). The HOF form evaluates its lambda through
  * interpreted expression trees per PLANE per row — measured hot path of
  * the embedding-LSH dedup; here the plane matrix rides along as one
  * codegen reference object (`double[][]`) and the whole signature is a
  * primitive loop nest the JIT can vectorize.
  *
  * `planes` is a constructor parameter (not a child expression): it is a
  * plan-time constant, and `IndexedSeq` keeps case-class equality
  * structural so canonicalization/reuse still dedupe identical plans. */
case class SrpSignature(child: Expression, planes: IndexedSeq[IndexedSeq[Double]])
    extends UnaryExpression {
  require(planes.nonEmpty && planes.length <= 64,
    s"SrpSignature supports 1..64 planes, got ${planes.length}")

  @transient private lazy val matrix: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"SrpSignature requires array<double>, got ${t.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    VectorOps.srpSign(v.asInstanceOf[ArrayData], matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("srpPlanes", matrix, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.srpSign($c, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): SrpSignature =
    copy(child = newChild)
}

/** Nearest-centroid assignment as ONE native map-only expression: the
  * `keep` codebook indices nearest to the vector (cosine on pre-normalized
  * inputs = plain dot), ordered (similarity desc, index asc). The codebook
  * rides as a codegen reference object (`double[][]`) — it is plan-time
  * metadata, bounded by nlist·d doubles.
  *
  * Replaces a `crossJoin(broadcast(centroids))` + `row_number` window
  * filtered to the top `keep`: that shape multiplies the corpus by nlist
  * rows and then SHUFFLES them all through a `Window.partitionBy(vid)`
  * exchange — nlist× the corpus through the wire for a per-row argmax. At
  * any corpus size this expression assigns in the scan's own stage: zero
  * exchange, zero row blowup. */
case class NearestCentroids(child: Expression,
    cents: IndexedSeq[IndexedSeq[Double]], keep: Int) extends UnaryExpression {
  require(cents.nonEmpty, "NearestCentroids requires a non-empty codebook")
  require(keep >= 1, s"keep must be >= 1, got $keep")

  @transient private lazy val matrix: Array[Array[Double]] =
    cents.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"NearestCentroids requires array<double>, got ${t.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    VectorOps.nearestCentroids(v.asInstanceOf[ArrayData], matrix, keep)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("ivfCodebook", matrix, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorOps.nearestCentroids($c, $m, $keep)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

/** Integer-exact nearest-centroid assignment for the TRAINABLE k-means
  * path ([[graft.operators.KMeans]]): squared-L2 argmin over a codebook of
  * QUANTIZED (non-negative long) vectors, packed into one long as
  * `dist² · |codebook| + cid` — minimizing the packed code IS the
  * lexicographic (dist, cid) argmin, so ties break to the smallest
  * centroid index exactly like a `row_number OVER (ORDER BY dist, cid)`.
  * All arithmetic is long (distances ≤ d·(2·scale+offset)² ≈ 2³⁷ at the
  * engine's 10⁴ scale, packed ≤ 2⁴³): associative, engine-independent,
  * relationally replayable to the bit — the device that makes a k-means
  * FIXPOINT hash-gateable where the double-valued refine path is not.
  * Same map-only shape as [[NearestCentroids]]: the codebook rides as a
  * codegen reference object, zero exchange, zero row blowup. */
case class CentroidArgminL2(child: Expression,
    cents: IndexedSeq[IndexedSeq[Long]]) extends UnaryExpression {
  require(cents.nonEmpty, "CentroidArgminL2 requires a non-empty codebook")

  @transient private lazy val matrix: Array[Array[Long]] =
    cents.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"CentroidArgminL2 requires array<bigint>, got ${t.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    VectorOps.argminL2Packed(v.asInstanceOf[ArrayData], matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("kmeansCodebook", matrix, "long[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.argminL2Packed($c, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidArgminL2 =
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

  /** See [[NearestCentroids]]: top-`keep` codebook indices by
    * (dot desc, index asc) — strict `>` keeps the earliest index on ties,
    * matching a `row_number` over (sim desc, cid asc). Selection scan per
    * slot: O(m·keep), m = |codebook| (small by construction). */
  def nearestCentroids(v: ArrayData, cents: Array[Array[Double]], keep: Int): ArrayData = {
    val m = cents.length
    val sims = new Array[Double](m)
    var c = 0
    while (c < m) {
      val ct = cents(c)
      val n = math.min(v.numElements(), ct.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += v.getDouble(i) * ct(i); i += 1 }
      sims(c) = s
      c += 1
    }
    val kk = math.min(keep, m)
    val taken = new Array[Boolean](m)
    val out = new Array[Int](kk)
    var o = 0
    while (o < kk) {
      var best = -1
      var j = 0
      while (j < m) {
        if (!taken(j) && (best < 0 || sims(j) > sims(best))) best = j
        j += 1
      }
      taken(best) = true
      out(o) = best
      o += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** See [[CentroidArgminL2]]: min over c of `distL2²(v, cents(c))·m + c`
    * — exact long arithmetic end to end (inputs are the quantized
    * non-negative integer vectors of [[graft.operators.KMeans]]). */
  def argminL2Packed(v: ArrayData, cents: Array[Array[Long]]): Long = {
    val m = cents.length
    var best = Long.MaxValue
    var c = 0
    while (c < m) {
      val ct = cents(c)
      val n = math.min(v.numElements(), ct.length)
      var s = 0L
      var i = 0
      while (i < n) { val d = v.getLong(i) - ct(i); s += d * d; i += 1 }
      val code = s * m + c
      if (code < best) best = code
      c += 1
    }
    best
  }

  /** SRP signature: bit per plane, MSB-first (plane 0 → highest emitted
    * bit), sign test strictly > 0 — both exactly matching the HOF fold
    * `acc = (acc << 1) | (dot(v, plane) > 0 ? 1 : 0)`. */
  def srpSign(v: ArrayData, planes: Array[Array[Double]]): Long = {
    var acc = 0L
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      val n = math.min(v.numElements(), pl.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += v.getDouble(i) * pl(i); i += 1 }
      acc = (acc << 1) | (if (s > 0) 1L else 0L)
      p += 1
    }
    acc
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
