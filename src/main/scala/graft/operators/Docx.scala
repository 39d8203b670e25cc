package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

/** DOCX (OOXML WordprocessingML, ECMA-376) text extraction — with PDF
  * and HTML the third dominant document format of a real training
  * corpus, and the one office suites emit. A .docx is a zip whose
  * `word/document.xml` carries the body; visible text lives in
  * `<w:t>` runs, paragraphs end at `</w:p>`, explicit tabs/breaks are
  * the empty elements `<w:tab/>` / `<w:br/>` (ECMA-376 §17.3).
  *
  * Architecture mirrors [[Pdf]]/[[Html]]: per-row pure byte math inside
  * `mapPartitions` (zero exchanges), total functions (malformed input
  * degrades to None, never a throw), and the zip walk goes through
  * [[graft.sources.Archives.zipMembers]] — so the decompression-bomb
  * walls (member/count/total caps enforced DURING inflation) guard this
  * path identically. No DOM: a single linear quote-aware tag scan, so
  * cost is O(bytes) with no allocation cliff on hostile nesting.
  *
  * XML entity decoding is the XML-1.0 set ONLY (the five predefined
  * names + numeric references): `&nbsp;` is not XML and stays literal —
  * deliberately NOT [[graft.functions.HtmlEntities]], whose HTML names
  * would over-decode an XML document.
  */
object Docx {

  /** Max extracted characters per document. */
  val TextCap: Int = 1 << 24

  /** Extract the document text from a .docx payload: '\n' between
    * paragraphs, '\t' for `<w:tab/>`, '\n' for `<w:br/>`, `<w:t>` run
    * content decoded literally (no whitespace normalization — OOXML
    * text runs are exact). None when the payload is not a zip, breaches
    * a bomb cap, or lacks `word/document.xml`. */
  def extractText(payload: Array[Byte], maxOut: Int = TextCap): Option[String] =
    graft.sources.Archives.zipMembers(payload).flatMap { members =>
      members.collectFirst { case ("word/document.xml", b) => b }
        .map(b => extractXmlText(new String(b, UTF_8), maxOut))
    }

  /** The WordprocessingML walk over one XML string. Total — any input
    * yields a (possibly empty) string. Namespace prefixes are ignored
    * (`<w:t>`, `<ns0:t>`, bare `<t>` all count): prefix binding is a
    * document-level convention, the local name is the semantics. */
  def extractXmlText(xml: String, maxOut: Int): String = {
    if (xml == null) return ""
    val n = xml.length
    val sb = new StringBuilder
    var sepPending = false // a finished paragraph awaiting following text
    var inText = false     // inside an open <w:t> run
    var i = 0
    def emit(s: String): Unit = {
      if (sepPending && sb.nonEmpty && s.nonEmpty) sb.append('\n')
      if (s.nonEmpty) sepPending = false
      var k = 0
      while (k < s.length && sb.length < maxOut) { sb.append(s.charAt(k)); k += 1 }
    }
    while (i < n && sb.length < maxOut) {
      if (xml.charAt(i) == '<') {
        if (xml.startsWith("<!--", i)) {
          val e = xml.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (xml.startsWith("<![CDATA[", i)) {
          val e = xml.indexOf("]]>", i + 9)
          val lit = if (e < 0) xml.substring(i + 9) else xml.substring(i + 9, e)
          // CDATA is literal character data — text only inside a run
          if (inText) emit(lit)
          i = if (e < 0) n else e + 3
        } else {
          var j = i + 1
          val closing = j < n && xml.charAt(j) == '/'
          if (closing) j += 1
          val nameStart = j
          while (j < n && xml.charAt(j) != '>' && xml.charAt(j) != '/' &&
            !Character.isWhitespace(xml.charAt(j))) j += 1
          val raw = xml.substring(nameStart, j)
          val local = raw.substring(raw.indexOf(':') + 1) // -1+1=0: no prefix
          val tagEnd = skipTagEnd(xml, j)
          // self-closed (`<w:t/>`) opens nothing
          val selfClosed = tagEnd - 2 >= i && xml.charAt(tagEnd - 2) == '/' &&
            xml.charAt(tagEnd - 1) == '>'
          local match {
            case "t" => inText = !closing && !selfClosed
            case "p" if closing => sepPending = true
            case "br" if !closing => emit("\n")
            case "tab" if !closing => emit("\t")
            case _ => ()
          }
          i = tagEnd
        }
      } else {
        val next = xml.indexOf('<', i)
        val end = if (next < 0) n else next
        // character data outside w:t is layout/properties, not text
        if (inText) emit(xmlUnescape(xml.substring(i, end)))
        i = end
      }
    }
    sb.toString
  }

  private def skipTagEnd(xml: String, from: Int): Int = {
    var i = from
    var quote: Char = 0
    while (i < xml.length) {
      val c = xml.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return i + 1
      i += 1
    }
    i
  }

  /** XML-1.0 entity decode: the five predefined names + decimal/hex
    * character references. Unknown/unterminated references stay
    * literal (total function). */
  def xmlUnescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val body = if (semi < 0 || semi - i > 12) null else s.substring(i + 1, semi)
        val rep: String = body match {
          case "amp" => "&"
          case "lt" => "<"
          case "gt" => ">"
          case "quot" => "\""
          case "apos" => "'"
          case b if b != null && b.startsWith("#") =>
            try {
              val cp = if (b.length > 1 && (b.charAt(1) == 'x' || b.charAt(1) == 'X'))
                Integer.parseInt(b.substring(2), 16)
              else Integer.parseInt(b.substring(1))
              if (Character.isValidCodePoint(cp)) new String(Character.toChars(cp))
              else null
            } catch { case _: Exception => null }
          case _ => null
        }
        if (rep != null) { sb.append(rep); i = semi + 1 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Mint a minimal VALID .docx: [Content_Types].xml + the body, one
    * `<w:p>` per paragraph, runs within a paragraph separated by
    * `<w:tab/>`. The fixture inverse of [[extractText]] for oracle
    * queries and specs (escape roundtrip included). */
  def mint(paragraphs: Seq[Seq[String]]): Array[Byte] = {
    val ns = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    val body = paragraphs.map { runs =>
      "<w:p><w:r>" + runs.map(r =>
        s"""<w:t xml:space="preserve">${xmlEscape(r)}</w:t>""")
        .mkString("<w:tab/>") + "</w:r></w:p>"
    }.mkString
    val doc =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<w:document xmlns:w="$ns"><w:body>$body</w:body></w:document>"""
        .stripMargin
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
        |</Types>""".stripMargin
    graft.sources.Archives.zip(Seq(
      "[Content_Types].xml" -> contentTypes.getBytes(UTF_8),
      "word/document.xml" -> doc.getBytes(UTF_8)))
  }
}
