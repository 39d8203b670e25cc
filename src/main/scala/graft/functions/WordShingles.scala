package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingle set as ONE native expression.
  *
  * The higher-order-function formulation
  * (`array_distinct(transform(sequence(...), concat_ws(element_at...)))`)
  * works but is interpreted per element and exposed to three optimizer
  * traps (lambda re-evaluation, slice copies, InferFiltersFromGenerate
  * re-substitution — see Dedup.shingleExpr history). A single codegen'd
  * expression does one pass per row over UTF8String words with
  * first-occurrence dedup, and gives the optimizer nothing to take apart.
  * Output order = first occurrence, matching `array_distinct`.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"WordShingles requires array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextOps.shingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** 64-bit SimHash over a word array as ONE native expression: per-bit
  * majority vote of the word hashes, folded row-locally. Replaces an
  * explode + 64-column hash aggregate — i.e. removes the token exchange
  * from the simhash plan entirely; the operator becomes a map-only
  * projection. The hash family is engine-private (FNV-1a 64), so only
  * internal consistency matters, and both the signature and banding
  * paths share this one implementation. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"SimHash64 requires array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextOps.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Winnowing fingerprint selection as ONE native expression: k-gram
  * rolling hashes + per-window minima + first-occurrence dedup, one pass
  * per row (see TextAnalysis.winnowFingerprints for the algorithm and
  * guarantee). Output: array<long> selected fingerprints; empty for docs
  * with fewer than k words. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"WinnowFingerprints requires array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextOps.winnow(input.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.winnow($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object TextOps {
  private val Space = UTF8String.fromString(" ")

  /** One pass: L−n+1 shingles, first-occurrence dedup. Null words (never
    * produced by split) are treated as empty strings. */
  def shingles(words: ArrayData, n: Int): ArrayData = {
    val L = words.numElements()
    if (L < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= L - n) {
      var k = 0
      while (k < n) {
        val w = words.getUTF8String(i + k)
        parts(k) = if (w == null) UTF8String.EMPTY_UTF8 else w
        k += 1
      }
      seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** FNV-1a 64 over UTF8String bytes (JVM wrap-around multiply — this is
    * engine code, not SQL arithmetic, so ANSI overflow rules don't apply). */
  private def fnv1a64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** k-gram hashes → sliding-window minima → first-occurrence dedup.
    * Gram hash = FNV-1a over the k words' bytes with a separator byte
    * (no intermediate string concatenation). */
  def winnow(words: ArrayData, k: Int, w: Int): ArrayData = {
    val L = words.numElements()
    if (L < k) return new GenericArrayData(Array.empty[Any])
    val g = L - k + 1
    val grams = new Array[Long](g)
    var i = 0
    while (i < g) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < k) {
        val word = words.getUTF8String(i + j)
        if (word != null) {
          val bytes = word.getBytes
          var b = 0
          while (b < bytes.length) {
            h ^= (bytes(b) & 0xffL); h *= 0x100000001b3L; b += 1
          }
        }
        h ^= 0x20L; h *= 0x100000001b3L   // separator
        j += 1
      }
      grams(i) = h
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (g < w) {
      var m = grams(0); var x = 1
      while (x < g) { if (grams(x) < m) m = grams(x); x += 1 }
      seen.add(m)
    } else {
      var j = 0
      while (j <= g - w) {
        var m = grams(j); var x = j + 1
        while (x < j + w) { if (grams(x) < m) m = grams(x); x += 1 }
        seen.add(m)
        j += 1
      }
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** Per-bit majority vote of word hashes; empty input → 0. */
  def simhash64(words: ArrayData): Long = {
    val L = words.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < L) {
      val w = words.getUTF8String(i)
      if (w != null) {
        val h = fnv1a64(w)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
