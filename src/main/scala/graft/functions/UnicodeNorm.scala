package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization for multilingual ingest — the
  * normalization every cross-source corpus needs before hashing, dedup,
  * or tokenization: byte-identical text that differs only in combining
  * form (é vs e+◌́) must hash identically, or exact dedup silently
  * misses real duplicates.
  *
  * Two native expressions (real `doGenCode`, the HtmlUnescape pattern —
  * rows stay in Tungsten, the call is a static method):
  *  - [[UnicodeNfc]]: NFC canonical composition (the storage-canonical
  *    form; mirrors DuckDB's `nfc_normalize`). NFKC (compatibility
  *    folding — full-width forms, ligatures) is available via
  *    [[UnicodeNormOps.nfkc]] for callers; the hash-gated surface pins
  *    NFC, the form both engines implement.
  *  - [[StripAccents]]: NFD decomposition, combining marks (\\p{Mn})
  *    removed, NFC recomposition — the search/match folding (mirrors
  *    DuckDB's `strip_accents` on the Latin ranges the fixtures pin).
  *
  * ASCII fast path: both ops scan for a high byte first and return the
  * input untouched when pure ASCII — at 100 TB most bytes are ASCII and
  * never pay the Normalizer.
  */
object UnicodeNormOps {
  private def isAscii(u: UTF8String): Boolean = {
    val n = u.numBytes()
    var i = 0
    val base = u.getBaseObject
    val off = u.getBaseOffset
    while (i < n) {
      if ((org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0x80) != 0)
        return false
      i += 1
    }
    true
  }

  def nfc(u: UTF8String): UTF8String =
    if (isAscii(u)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(u.toString, java.text.Normalizer.Form.NFC))

  def nfkc(u: UTF8String): UTF8String =
    if (isAscii(u)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(u.toString, java.text.Normalizer.Form.NFKC))

  def stripAccents(u: UTF8String): UTF8String =
    if (isAscii(u)) u
    else {
      val nfd = java.text.Normalizer.normalize(u.toString,
        java.text.Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(nfd.length)
      var i = 0
      while (i < nfd.length) {
        val c = nfd.charAt(i)
        if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
        i += 1
      }
      UTF8String.fromString(java.text.Normalizer.normalize(sb.toString,
        java.text.Normalizer.Form.NFC))
    }
}

case class UnicodeNfc(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    UnicodeNormOps.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNormOps.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): UnicodeNfc =
    copy(child = newChild)
}

case class UnicodeNfkc(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    UnicodeNormOps.nfkc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNormOps.nfkc($c)")
  override protected def withNewChildInternal(newChild: Expression): UnicodeNfkc =
    copy(child = newChild)
}

case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    UnicodeNormOps.stripAccents(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNormOps.stripAccents($c)")
  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}
