package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization primitives (Jégou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011) as native
  * codegen'd Catalyst expressions — the memory-side scale device of
  * similarity search: a d-dim double vector (d·8 bytes) compresses to `m`
  * small codes (stored as ints here; 1 byte each in a production layout),
  * a 32× shrink at the served d=64/m=16 config that is what lets a
  * 100 TB corpus's index live in cluster RAM while the raw vectors stay
  * on disk.
  *
  * The codebook (m subspaces × ksub codewords × d/m dims) is plan-time
  * metadata riding codegen as one `double[][][]` reference object — the
  * [[NearestCentroids]] contract: encoding and scoring are MAP-ONLY, the
  * corpus never shuffles or blows up row-wise for quantization.
  *
  * All folds are sequential left-to-right in double ([[VectorOps.dot]]'s
  * contract), and ADC accumulates per-subspace partials in subspace order
  * — the exact IEEE shape a relational oracle replays with per-subspace
  * `list_dot_product` over list slices plus an explicit left-associated
  * sum, so PQ outputs are hash-comparable at basis-point rounding.
  */
object PqOps {

  /** Per-subspace encode: code_j = argmax_c ( x_j·c − ‖c‖²/2 ), ties to
    * the smallest code — algebraically argmin_c ‖x_j − c‖² with the
    * x-only term dropped (constant per row), written in the dot-product
    * form both engines compute bit-identically. Strict `>` scan keeps
    * the earliest code, matching `row_number() OVER (score DESC, code
    * ASC)`. */
  def encode(v: ArrayData, cb: Array[Array[Array[Double]]],
      halfCc: Array[Array[Double]]): ArrayData = {
    val m = cb.length
    val out = new Array[Int](m)
    var j = 0
    var off = 0
    while (j < m) {
      val codes = cb(j)
      val dsub = if (codes.isEmpty) 0 else codes(0).length
      var best = -1
      var bestS = 0.0
      var c = 0
      while (c < codes.length) {
        val ct = codes(c)
        var s = 0.0
        var i = 0
        while (i < dsub) { s += v.getDouble(off + i) * ct(i); i += 1 }
        s -= halfCc(j)(c)
        if (best < 0 || s > bestS) { best = c; bestS = s }
        c += 1
      }
      out(j) = best
      off += dsub
      j += 1
    }
    new GenericArrayData(out)
  }

  /** ADC lookup table for one query: lut[j][c] = q_j · codeword — computed
    * ONCE per query row (m·ksub sub-dots) and broadcast with it, so
    * corpus-side scoring is m table lookups per pair instead of a d-mult
    * dot product — the compute-side PQ win (d/m × fewer multiplies). */
  def lut(v: ArrayData, cb: Array[Array[Array[Double]]]): ArrayData = {
    val m = cb.length
    val rows = new Array[Any](m)
    var j = 0
    var off = 0
    while (j < m) {
      val codes = cb(j)
      val dsub = if (codes.isEmpty) 0 else codes(0).length
      val dps = new Array[Double](codes.length)
      var c = 0
      while (c < codes.length) {
        val ct = codes(c)
        var s = 0.0
        var i = 0
        while (i < dsub) { s += v.getDouble(off + i) * ct(i); i += 1 }
        dps(c) = s
        c += 1
      }
      rows(j) = new GenericArrayData(dps)
      off += dsub
      j += 1
    }
    new GenericArrayData(rows)
  }

  /** Asymmetric-distance score: Σ_j lut[j][codes[j]], accumulated in
    * subspace order from 0.0 — the left-associated grouped sum the oracle
    * mirrors term-by-term. */
  def adc(codes: ArrayData, lut: ArrayData): Double = {
    val m = math.min(codes.numElements(), lut.numElements())
    var s = 0.0
    var j = 0
    while (j < m) {
      s += lut.getArray(j).getDouble(codes.getInt(j))
      j += 1
    }
    s
  }
}

/** PQ encode as ONE native map-only expression: `m` codes per vector,
  * codebook as a codegen reference object. See [[PqOps.encode]]. */
case class PqEncode(child: Expression,
    codebooks: IndexedSeq[IndexedSeq[IndexedSeq[Double]]]) extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "PqEncode requires a non-empty codebook per subspace")

  @transient private lazy val matrix: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  /** ‖c‖²/2 per codeword, the same sequential self-dot fold the oracle's
    * `list_dot_product(c, c) / 2` computes — precomputed plan-time. */
  @transient private lazy val halfCc: Array[Array[Double]] =
    matrix.map(_.map { ct =>
      var s = 0.0
      var i = 0
      while (i < ct.length) { s += ct(i) * ct(i); i += 1 }
      s / 2
    })

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"PqEncode requires array<double>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    PqOps.encode(v.asInstanceOf[ArrayData], matrix, halfCc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", matrix, "double[][][]")
    val hc = ctx.addReferenceObj("pqHalfCc", halfCc, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqOps.encode($c, $cb, $hc)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Per-query ADC lookup table as ONE native expression (query side only —
  * evaluated on the handful of broadcast query rows). See [[PqOps.lut]]. */
case class PqLut(child: Expression,
    codebooks: IndexedSeq[IndexedSeq[IndexedSeq[Double]]]) extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "PqLut requires a non-empty codebook per subspace")

  @transient private lazy val matrix: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"PqLut requires array<double>, got ${t.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    PqOps.lut(v.asInstanceOf[ArrayData], matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", matrix, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqOps.lut($c, $cb)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** ADC score of an encoded vector against a query's LUT — m array lookups
  * + m−1 adds per candidate pair, the PQ hot path. See [[PqOps.adc]]. */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"PqAdc requires (array<int>, array<array<double>>), got " +
        s"${l.simpleString} / ${r.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(codes: Any, lut: Any): Any =
    PqOps.adc(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, l) => s"graft.functions.PqOps.adc($c, $l)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}
