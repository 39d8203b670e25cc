package graft.operators

/** Minimal-but-REAL PDF text extraction in pure JVM byte math — the
  * dominant document format of any crawled training corpus. From the
  * public PDF 1.4+ spec (ISO 32000 subset):
  *
  *  - balanced `<< … >>` dictionary scan to find `stream … endstream`
  *    blocks (no xref dependence — a linear object walk survives the
  *    torn/appended files a crawl actually yields),
  *  - `/FlateDecode` streams inflated with `java.util.zip` under a hard
  *    output cap checked DURING inflation (deflate bombs cost the cap,
  *    not the blowup — the Archives contract),
  *  - content-stream text operators: `(…) Tj`, `(…) '`, `(…) "`,
  *    `[(…) n (…)] TJ`, and hex strings `<…> Tj`; literal strings with
  *    the full escape set (\n \r \t \b \f \( \) \\ \ooo, line
  *    continuations, nested balanced parens),
  *  - `Td`/`TD`/`T*` emit a newline between text runs (the standard
  *    layout heuristic — line moves separate lines).
  *
  * Out of scope, honestly: font /Encoding and /ToUnicode CMaps (text is
  * assumed byte≈ASCII — true for the Latin-script simple PDFs this
  * targets; a wild multi-byte-CID PDF extracts garbage-but-bounded,
  * never a crash), and object-stream (/ObjStm) compressed objects.
  *
  * [[minimal]] mints valid single-or-multi-page PDFs (correct xref
  * offsets, optional FlateDecode) for the oracle device and specs.
  */
object Pdf {

  /** Max extracted characters; also the per-stream inflate cap. */
  val TextCap: Int = 1 << 24

  /** Extract text from a PDF payload. None when the payload is not a
    * PDF (no %PDF header) — malformed INTERNALS degrade to partial or
    * empty text instead (extract what survives), and nothing throws. */
  def extractText(b: Array[Byte], maxOut: Int = TextCap): Option[String] = {
    if (b.length < 5 || b(0) != '%' || b(1) != 'P' || b(2) != 'D' ||
        b(3) != 'F' || b(4) != '-') return None
    val out = new StringBuilder
    try {
      var i = 0
      while (i < b.length - 1 && out.length < maxOut) {
        if (b(i) == '<' && b(i + 1) == '<') {
          val dictEnd = balancedDictEnd(b, i)
          if (dictEnd < 0) { i += 2 }
          else {
            val afterDict = skipWs(b, dictEnd)
            if (remainingStartsWith(b, afterDict, "stream")) {
              var s = afterDict + 6
              if (s < b.length && b(s) == '\r') s += 1
              if (s < b.length && b(s) == '\n') s += 1
              val e = indexOf(b, "endstream", s)
              if (e < 0) { i = b.length }
              else {
                val dict = new String(b, i, dictEnd - i, "ISO-8859-1")
                val raw = java.util.Arrays.copyOfRange(b, s, trimEol(b, s, e))
                val data =
                  if (dict.contains("/FlateDecode")) inflateCapped(raw, maxOut)
                  else Some(raw)
                data.foreach(d => scanContent(d, out, maxOut))
                i = e + 9
              }
            } else i = dictEnd
          }
        } else i += 1
      }
    } catch { case _: Exception => () }  // belt + braces: partial text
    Some(out.toString)
  }

  /** End index (exclusive) of the balanced `<< … >>` dict starting at
    * `i`, skipping string literals (a `>>` inside `(…)`` is text). */
  private def balancedDictEnd(b: Array[Byte], i0: Int): Int = {
    var i = i0 + 2
    var depth = 1
    while (i < b.length - 1) {
      b(i) match {
        case '<' if b(i + 1) == '<' => depth += 1; i += 2
        case '>' if b(i + 1) == '>' =>
          depth -= 1; i += 2
          if (depth == 0) return i
        case '(' => i = skipLiteral(b, i)
        case _ => i += 1
      }
    }
    -1
  }

  private def skipLiteral(b: Array[Byte], i0: Int): Int = {
    var i = i0 + 1
    var depth = 1
    while (i < b.length && depth > 0) {
      b(i) match {
        case '\\' => i += 2
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case _ => i += 1
      }
    }
    i
  }

  private def skipWs(b: Array[Byte], i0: Int): Int = {
    var i = i0
    while (i < b.length && (b(i) == ' ' || b(i) == '\n' || b(i) == '\r' ||
      b(i) == '\t' || b(i) == 0)) i += 1
    i
  }

  private def remainingStartsWith(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length &&
      (0 until s.length).forall(k => b(i + k) == s.charAt(k))

  private def indexOf(b: Array[Byte], s: String, from: Int): Int = {
    var i = math.max(0, from)
    while (i + s.length <= b.length) {
      if (remainingStartsWith(b, i, s)) return i
      i += 1
    }
    -1
  }

  /** Stream data ends before the EOL that precedes `endstream`. */
  private def trimEol(b: Array[Byte], s: Int, e: Int): Int = {
    var t = e
    if (t > s && b(t - 1) == '\n') t -= 1
    if (t > s && b(t - 1) == '\r') t -= 1
    t
  }

  private def inflateCapped(raw: Array[Byte], cap: Int): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(raw)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return None       // stalled/malformed
        if (out.size + n > cap) return None              // bomb wall
        out.write(buf, 0, n)
      }
      Some(out.toByteArray)
    } catch { case _: Exception => None }
    finally inf.end()
  }

  /** Walk one decoded stream for text-showing operators. */
  private def scanContent(d: Array[Byte], out: StringBuilder, maxOut: Int): Unit = {
    var i = 0
    def emit(s: String): Unit = {
      val room = maxOut - out.length
      if (room > 0) out.append(if (s.length <= room) s else s.take(room))
    }
    def newline(): Unit =
      if (out.nonEmpty && out.charAt(out.length - 1) != '\n') emit("\n")
    while (i < d.length && out.length < maxOut) {
      d(i) match {
        case '(' =>
          val (s, ni) = literal(d, i)
          i = skipWs(d, ni)
          if (remainingStartsWith(d, i, "Tj") ||
              (i < d.length && (d(i) == '\'' || d(i) == '"'))) emit(s)
        case '<' if i + 1 < d.length && d(i + 1) != '<' =>
          val (s, ni) = hexString(d, i)
          i = skipWs(d, ni)
          if (remainingStartsWith(d, i, "Tj")) emit(s)
        case '[' =>
          // TJ array: strings + kerning numbers
          val parts = new StringBuilder
          var j = i + 1
          var okArr = true
          while (j < d.length && d(j) != ']' && okArr) {
            d(j) match {
              case '(' =>
                val (s, nj) = literal(d, j); parts.append(s); j = nj
              case '<' if j + 1 < d.length && d(j + 1) != '<' =>
                val (s, nj) = hexString(d, j); parts.append(s); j = nj
              case c if c == '-' || c == '.' || (c >= '0' && c <= '9') ||
                c == ' ' || c == '\n' || c == '\r' || c == '\t' => j += 1
              case _ => okArr = false
            }
          }
          if (okArr && j < d.length) {
            val after = skipWs(d, j + 1)
            if (remainingStartsWith(d, after, "TJ")) { emit(parts.toString); i = after + 2 }
            else i = j + 1
          } else i = i + 1
        case 'T' if i + 1 < d.length &&
            (d(i + 1) == 'd' || d(i + 1) == 'D' || d(i + 1) == '*') =>
          newline(); i += 2
        case _ => i += 1
      }
    }
  }

  /** Parse a literal string at `(`; returns (unescaped text, index after
    * the closing paren). */
  private def literal(d: Array[Byte], i0: Int): (String, Int) = {
    val sb = new StringBuilder
    var i = i0 + 1
    var depth = 1
    while (i < d.length && depth > 0) {
      d(i) match {
        case '\\' if i + 1 < d.length =>
          d(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case '\n' => i += 2                      // line continuation
            case '\r' =>
              i += 2; if (i < d.length && d(i) == '\n') i += 1
            case c if c >= '0' && c <= '7' =>        // \ooo, 1-3 digits
              var v = 0; var k = 0; i += 1
              while (k < 3 && i < d.length && d(i) >= '0' && d(i) <= '7') {
                v = v * 8 + (d(i) - '0'); i += 1; k += 1
              }
              sb.append((v & 0xff).toChar)
            case c => sb.append(c.toChar); i += 2    // incl. \( \) \\
          }
        case '(' => depth += 1; sb.append('('); i += 1
        case ')' =>
          depth -= 1; i += 1
          if (depth > 0) sb.append(')')
        case c => sb.append((c & 0xff).toChar); i += 1
      }
    }
    (sb.toString, i)
  }

  /** Parse a hex string at `<`; returns (text, index after `>`). */
  private def hexString(d: Array[Byte], i0: Int): (String, Int) = {
    val sb = new StringBuilder
    var i = i0 + 1
    var hi = -1
    while (i < d.length && d(i) != '>') {
      val c = d(i).toChar
      val v = Character.digit(c, 16)
      if (v >= 0) {
        if (hi < 0) hi = v
        else { sb.append(((hi << 4) | v).toChar); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) sb.append((hi << 4).toChar)         // odd count: final 0
    (sb.toString, if (i < d.length) i + 1 else i)
  }

  // ===== minting =====

  private def esc(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '(' => "\\("
      case ')' => "\\)"
      case c => c.toString
    }

  /** Mint a VALID minimal PDF (correct xref offsets) with one content
    * stream per page: `BT /F1 12 Tf 72 720 Td (text) Tj ET`, optionally
    * FlateDecoded. */
  def minimal(pageTexts: Seq[String], flate: Boolean = false): Array[Byte] = {
    require(pageTexts.nonEmpty, "at least one page")
    val n = pageTexts.size
    val fontObj = 3 + 2 * n
    val objs = Seq.newBuilder[Array[Byte]]
    objs += s"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n".getBytes("ISO-8859-1")
    val kids = (0 until n).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    objs += s"2 0 obj << /Type /Pages /Kids [$kids] /Count $n >> endobj\n".getBytes("ISO-8859-1")
    pageTexts.zipWithIndex.foreach { case (t, i) =>
      val pageId = 3 + 2 * i
      val contId = 4 + 2 * i
      objs += (s"$pageId 0 obj << /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 612 792] /Contents $contId 0 R " +
        s"/Resources << /Font << /F1 $fontObj 0 R >> >> >> endobj\n")
        .getBytes("ISO-8859-1")
      val content = s"BT /F1 12 Tf 72 720 Td (${esc(t)}) Tj ET"
        .getBytes("ISO-8859-1")
      val data = if (flate) deflate(content) else content
      val filter = if (flate) " /Filter /FlateDecode" else ""
      objs += (s"$contId 0 obj << /Length ${data.length}$filter >>\nstream\n"
        .getBytes("ISO-8859-1") ++ data ++ "\nendstream endobj\n".getBytes("ISO-8859-1"))
    }
    objs += (s"$fontObj 0 obj << /Type /Font /Subtype /Type1 " +
      s"/BaseFont /Helvetica >> endobj\n").getBytes("ISO-8859-1")
    val header = "%PDF-1.4\n".getBytes("ISO-8859-1")
    val body = objs.result()
    val offsets = body.scanLeft(header.length)((acc, o) => acc + o.length)
    val xrefPos = offsets.last
    val nObjs = body.size + 1
    val xref = new StringBuilder
    xref.append(s"xref\n0 $nObjs\n0000000000 65535 f \n")
    offsets.dropRight(1).foreach(o => xref.append(f"$o%010d 00000 n \n"))
    xref.append(s"trailer << /Size $nObjs /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    header ++ body.flatten.toArray ++ xref.toString.getBytes("ISO-8859-1")
  }

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }
}
