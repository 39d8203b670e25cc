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

/** POSITIONAL word n-grams (`sep`-joined, every occurrence, NO dedup)
  * as ONE native expression — the LM/feature counterpart of
  * [[WordShingles]] (which dedups): bigram features, HLL bigram rows,
  * LM (p, t) events, event-path windows (sep " -> "). Replaces the
  * slice+zip_with interpreted HOF (two array copies + one lambda eval
  * per gram). Under n words yields the empty array; null words join as
  * empty strings (the [[WordShingles]] convention). */
case class WordNgrams(child: Expression, n: Int, sep: String = " ")
    extends UnaryExpression {
  require(n >= 1, "n-gram width must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"WordNgrams requires array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val sepU = UTF8String.fromString(sep)

  override def nullSafeEval(input: Any): Any =
    TextOps.ngrams(input.asInstanceOf[ArrayData], n, sepU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sep", sepU,
      "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextOps.ngrams($c, $n, $sepRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

/** |A ∩ B| of two string arrays as ONE native expression — exactly
  * `size(array_intersect(a, b))` (distinct common elements, a shared
  * null element counts once) without materializing the intersection
  * ARRAY per row: the dedup verify stages evaluate this once per
  * candidate pair over millions of pairs, and the only consumer of the
  * intersection is its size. */
case class IntersectSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"IntersectSize requires two array<string>, got " +
          s"${l.simpleString} / ${r.simpleString}")
    }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any =
    TextOps.intersectSize(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextOps.intersectSize($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): IntersectSize =
    copy(left = newLeft, right = newRight)
}

/** Character trigrams of a string as ONE native expression — the langid
  * / trigram-postings feature unit. Output order is positional (every
  * occurrence, the profile-count contract); `distinct = true` keeps the
  * first occurrence only (≡ `array_distinct`, the postings contract).
  * Code-POINT boundaries, matching both prior formulations (regex
  * `split("")` iterates code points; SQL `substring` is code-point
  * indexed); under 3 code points yields the empty array. Replaces the
  * interpreted per-position transform/element_at (or substring) HOFs —
  * one pass over the UTF-8 bytes, no per-trigram Catalyst eval. */
case class CharTrigrams(child: Expression, distinct: Boolean)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"CharTrigrams requires string, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextOps.charTrigrams(input.asInstanceOf[UTF8String], distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextOps.charTrigrams($c, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): CharTrigrams =
    copy(child = newChild)
}

/** SimHash over a word array as ONE native expression: per-bit majority
  * vote of the word hashes, folded row-locally. Replaces an explode +
  * per-bit hash aggregate — i.e. removes the token exchange from the
  * simhash plan entirely; the operator becomes a map-only projection.
  *
  * Hash basis (r8): the per-word hash is the FIRST 60 BITS OF md5 —
  * i.e. the value of the digest's first 15 hex chars — so the signature
  * is reproducible in ANY engine with an md5 builtin (DuckDB:
  * `CAST('0x'||substring(md5(w),1,15) AS BIGINT)`), which is what turns
  * the q_dedup_simhash driver row from rows-only into a full
  * hash-checked oracle. The signature is still a LongType; bits 60-63
  * are always zero (the 4-chunk pigeonhole banding still covers all
  * set bits). The former FNV-1a basis was engine-private and therefore
  * unverifiable outside scalatest. */
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

/** POSITIONAL k-gram hashes as ONE native expression: the 60-bit
  * md5-prefix hash of every k consecutive words (joined by single
  * spaces), in position order, NO dedup — the per-position unit of
  * duplicated-span detection ([[graft.operators.TextAnalysis
  * .duplicatedSpans]]). Same hash contract as [[WinnowFingerprints]]
  * (winnowing is these hashes + window-min selection), so both are
  * reproducible by the SQL oracle's `md5(w[i]||' '||...)` prefix parse.
  * Docs with fewer than k words yield the empty array. */
case class GramHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"GramHashes requires array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextOps.gramHashes(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.gramHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

/** MinHash LSH band buckets as ONE native expression: per document, the
  * `numHashes` signature minima AND the `bands` band-bucket hashes in a
  * single pass over the shingle array — `array<long>` of length `bands`
  * out, ready to `posexplode` into (band, bucket) blocking keys.
  *
  * Replaces a 128-buffer hash aggregate over exploded shingle ROWS: that
  * shape pays a one-time multi-second whole-stage-codegen compile for the
  * 128-column aggregate, an exchange of per-doc partials, and the explode
  * itself. Here the signature never materializes in the plan (no 128-col
  * row), the shingle set is the SAME `_arr` the verification stage
  * already computes, and the only generated column is the bands array.
  *
  * Hash family: base = XXH64(shingle bytes, seed 42) — Spark's own
  * `xxhash64` kernel — re-hashed per function index with `hashLong(base,
  * i)` (12 fixed bytes per member, never the string). Band bucket =
  * chained `hashLong` over the band's `r` minima. Candidate exactness
  * never depends on these values (verification is exact); only recall
  * does, and the family is deterministic across runs/executors. */
case class MinHashBands(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression {
  require(numHashes > 0 && bands > 0 && numHashes % bands == 0,
    s"numHashes ($numHashes) must be a positive multiple of bands ($bands)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"MinHashBands requires array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextOps.minhashBands(input.asInstanceOf[ArrayData], numHashes, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextOps.minhashBands($c, $numHashes, $bands)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

object TextOps {
  private val Space = UTF8String.fromString(" ")

  /** See [[MinHashBands]]. Empty shingle array → empty bands array (a doc
    * with no shingles can never be a candidate — mirrors the aggregate
    * form, where a doc with no shingle rows produced no signature row).
    * An array whose elements are ALL null gets the same empty-array
    * treatment: without it, every such doc would keep its mins at
    * Long.MaxValue and spuriously collide with every other all-null doc
    * (unreachable via Dedup.shingleSet, but the SQL-registered
    * `minhash_bands` accepts arbitrary arrays). */
  def minhashBands(shingles: ArrayData, k: Int, bands: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val L = shingles.numElements()
    if (L == 0) return new GenericArrayData(Array.empty[Any])
    val r = k / bands
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var hashedAny = false
    var s = 0
    while (s < L) {
      val sh = shingles.getUTF8String(s)
      if (sh != null) {
        hashedAny = true
        val base = XXH64.hashUTF8String(sh, 42L)
        var i = 0
        while (i < k) {
          val h = XXH64.hashLong(base, i)
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      s += 1
    }
    if (!hashedAny) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 42L
      var j = b * r
      while (j < (b + 1) * r) { acc = XXH64.hashLong(mins(j), acc); j += 1 }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  /** See [[WordNgrams]]: positional n-grams, one pass, no dedup. Null
    * words (never produced by split) are treated as empty strings —
    * the [[shingles]] convention. */
  def ngrams(words: ArrayData, n: Int): ArrayData = ngrams(words, n, Space)

  def ngrams(words: ArrayData, n: Int, sep: UTF8String): ArrayData = {
    val L = words.numElements()
    if (L < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[AnyRef](L - n + 1)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= L - n) {
      var k = 0
      while (k < n) {
        val w = words.getUTF8String(i + k)
        parts(k) = if (w == null) UTF8String.EMPTY_UTF8 else w
        k += 1
      }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** See [[IntersectSize]]: |A ∩ B| with `array_intersect` semantics —
    * distinct elements of `a` that also occur in `b`; a null element
    * present in both sides counts once. One pass per side, no
    * intersection array materialized. */
  def intersectSize(a: ArrayData, b: ArrayData): Int = {
    val nb = b.numElements()
    val na = a.numElements()
    if (na == 0 || nb == 0) return 0
    val inB = new java.util.HashSet[UTF8String](Math.max(8, nb * 2))
    var bNull = false
    var j = 0
    while (j < nb) {
      val w = b.getUTF8String(j)
      if (w == null) bNull = true else inB.add(w)
      j += 1
    }
    val seen = new java.util.HashSet[UTF8String](Math.max(8, na))
    var n = 0
    var aNullCounted = false
    var i = 0
    while (i < na) {
      val w = a.getUTF8String(i)
      if (w == null) {
        if (bNull && !aNullCounted) { n += 1; aNullCounted = true }
      } else if (inB.contains(w) && seen.add(w)) n += 1
      i += 1
    }
    n
  }

  /** See [[CharTrigrams]]: one pass over the UTF-8 bytes — code-point
    * start offsets, then a zero-copy UTF8String per trigram window. */
  def charTrigrams(s: UTF8String, distinct: Boolean): ArrayData = {
    val b = s.getBytes
    val nb = b.length
    if (nb < 3) return new GenericArrayData(Array.empty[Any])
    val offs = new Array[Int](nb + 1)
    var n = 0
    var i = 0
    while (i < nb) {
      offs(n) = i; n += 1
      i += UTF8String.numBytesForFirstByte(b(i))
    }
    offs(n) = nb
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    if (!distinct) {
      val out = new Array[AnyRef](n - 2)
      var j = 0
      while (j < n - 2) {
        out(j) = UTF8String.fromBytes(b, offs(j), offs(j + 3) - offs(j))
        j += 1
      }
      new GenericArrayData(out)
    } else {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var j = 0
      while (j < n - 2) {
        seen.add(UTF8String.fromBytes(b, offs(j), offs(j + 3) - offs(j)))
        j += 1
      }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
    }
  }

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

  private val Md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of an md5 digest as a non-negative long — numerically
    * equal to parsing the digest's first 15 hex chars, so any engine with
    * an md5 builtin reproduces the value exactly (DuckDB:
    * `CAST('0x'||substring(md5(x),1,15) AS BIGINT)`). 15 chars, not 16:
    * the full 64 bits would overflow a SIGNED long parse on both sides. */
  private def md5First60(d: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }

  /** Position-ordered 60-bit md5-prefix k-gram hashes (words joined by
    * single spaces) — byte-identical to the SQL oracle's
    * `md5(w[i]||' '||...||' '||w[i+k-1])` prefix parse, no intermediate
    * string. Empty array for docs under k words. */
  private def gramHashArray(words: ArrayData, k: Int): Array[Long] = {
    val L = words.numElements()
    if (L < k) return Array.emptyLongArray
    val md = Md5.get()
    val g = L - k + 1
    val grams = new Array[Long](g)
    var i = 0
    while (i < g) {
      var j = 0
      while (j < k) {
        val word = words.getUTF8String(i + j)
        if (word != null) md.update(word.getBytes)
        if (j < k - 1) md.update(0x20.toByte)   // single-space separator
        j += 1
      }
      grams(i) = md5First60(md.digest())        // digest() resets the md
      i += 1
    }
    grams
  }

  /** See [[GramHashes]]. */
  def gramHashes(words: ArrayData, k: Int): ArrayData =
    new GenericArrayData(gramHashArray(words, k))

  /** k-gram hashes → sliding-window minima → first-occurrence dedup.
    * Gram hash contract = [[gramHashes]]. */
  def winnow(words: ArrayData, k: Int, w: Int): ArrayData = {
    val grams = gramHashArray(words, k)
    val g = grams.length
    if (g == 0) return new GenericArrayData(Array.empty[Any])
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

  /** Per-bit majority vote (ties → 0) over the words' 60-bit md5-prefix
    * hashes; empty input → 0. Bits 60-63 of the result are always zero —
    * see [[SimHash64]]'s hash-basis note. */
  def simhash64(words: ArrayData): Long = {
    val L = words.numElements()
    val md = Md5.get()
    val votes = new Array[Int](60)
    var i = 0
    while (i < L) {
      val w = words.getUTF8String(i)
      if (w != null) {
        md.update(w.getBytes)
        val h = md5First60(md.digest())
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
