package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** HTML entity unescape (reference: pushshift.py:72-73 uses Python
  * `html.unescape` on body/selftext at ingest).
  *
  * Implemented as a static JVM method so the Catalyst expression
  * [[HtmlUnescape]] can call it from generated code (stays inside
  * whole-stage codegen; no Scala-closure UDF on the ingest hot path).
  * Covers the named entities that occur in reddit payloads (the API
  * escapes only `& < > " '`) plus decimal/hex numeric entities.
  */
object HtmlEntities {
  private val named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "#39" -> "'")

  def unescape(s: String): String = {
    var i = s.indexOf('&')
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var start = 0
    while (i >= 0) {
      sb.append(s, start, i)
      val semi = s.indexOf(';', i + 1)
      if (semi < 0 || semi - i > 12) { sb.append('&'); start = i + 1 }
      else {
        val body = s.substring(i + 1, semi)
        val rep =
          if (body.startsWith("#x") || body.startsWith("#X"))
            try Some(new String(Character.toChars(Integer.parseInt(body.substring(2), 16))))
            catch { case _: Exception => None }
          else if (body.startsWith("#"))
            try Some(new String(Character.toChars(Integer.parseInt(body.substring(1)))))
            catch { case _: Exception => None }
          else named.get(body)
        rep match {
          case Some(r) => sb.append(r); start = semi + 1
          case None    => sb.append('&'); start = i + 1
        }
      }
      i = s.indexOf('&', start)
    }
    sb.append(s, start, s.length)
    sb.toString
  }

  /** UTF8String bridge for generated code. */
  def unescapeUTF8(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    // fast path: no '&' → return input buffer untouched (zero-copy)
    if (str.indexOf('&') < 0) s else UTF8String.fromString(unescape(str))
  }
}
