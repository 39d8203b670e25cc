package graft.operators

/** HTML → text extraction — the crawl-to-corpus step every web-scale
  * training pipeline runs before quality/dedup/tokenization. A single
  * linear state machine (no DOM — bounded memory regardless of input):
  *
  *  - `<script>`/`<style>` elements dropped wholly (content is code,
  *    not text), comments and CDATA skipped, tag attributes skipped
  *    with quote-awareness (a `>` inside `alt="a>b"` does not close),
  *  - block-level tags separate text with a newline, inline tags with
  *    a space; whitespace runs collapse (any run containing a newline
  *    → one `\n`, else one space), ends trimmed,
  *  - entities decoded per text chunk via [[graft.functions.HtmlEntities]]
  *    (the same table the ingest-normalization Expression uses — one
  *    entity surface, two callers),
  *  - unterminated scripts/comments/tags skip to end-of-input: torn
  *    HTML yields bounded partial text, never a hang or throw,
  *  - hard output cap ([[TextCap]]) — a pathological payload costs at
  *    most the cap.
  */
object Html {

  /** Max extracted characters. */
  val TextCap: Int = 1 << 24

  private val BlockTags: Set[String] = Set(
    "p", "div", "br", "li", "ul", "ol", "dl", "dt", "dd", "h1", "h2",
    "h3", "h4", "h5", "h6", "tr", "table", "thead", "tbody", "caption",
    "section", "article", "aside", "header", "footer", "nav", "main",
    "blockquote", "pre", "hr", "form", "fieldset", "address", "figure",
    "figcaption", "title", "body", "html", "head")

  /** Extract readable text from an HTML string. Total function — any
    * input yields a (possibly empty) string. */
  def extractText(html: String, maxOut: Int = TextCap): String = {
    if (html == null) return ""
    val n = html.length
    // pieces: decoded text chunks interleaved with separator markers
    val sb = new StringBuilder
    var sepNewline = false   // pending separator carries a newline
    var sepAny = false       // any pending separator
    def flushText(chunk: String): Unit = {
      val t = graft.functions.HtmlEntities.unescape(chunk)
      var k = 0
      while (k < t.length && sb.length < maxOut) {
        val c = t.charAt(k)
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
            c == 0x0b) {
          sepAny = true
          if (c == '\n' || c == '\r') sepNewline = true
        } else {
          if (sepAny && sb.nonEmpty)
            sb.append(if (sepNewline) '\n' else ' ')
          sepAny = false; sepNewline = false
          sb.append(c)
        }
        k += 1
      }
    }
    def lowerAt(i: Int, s: String): Boolean =
      i + s.length <= n &&
        (0 until s.length).forall(k => Character.toLowerCase(html.charAt(i + k)) == s.charAt(k))
    def indexOfLower(s: String, from: Int): Int = {
      var i = math.max(0, from)
      while (i + s.length <= n) {
        if (lowerAt(i, s)) return i
        i += 1
      }
      -1
    }
    var i = 0
    var textStart = 0
    def flushUpTo(end: Int): Unit =
      if (end > textStart) flushText(html.substring(textStart, end))
    while (i < n && sb.length < maxOut) {
      if (html.charAt(i) == '<') {
        flushUpTo(i)
        if (lowerAt(i, "<!--")) {
          val e = indexOfLower("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (lowerAt(i, "<![cdata[")) {
          val e = indexOfLower("]]>", i + 9)
          i = if (e < 0) n else e + 3
        } else if (lowerAt(i, "<script")) {
          val e = indexOfLower("</script", i + 7)
          i = if (e < 0) n else skipTagEnd(html, e + 8)
        } else if (lowerAt(i, "<style")) {
          val e = indexOfLower("</style", i + 6)
          i = if (e < 0) n else skipTagEnd(html, e + 7)
        } else {
          // tag: name then quote-aware attribute skip
          var j = i + 1
          if (j < n && html.charAt(j) == '/') j += 1
          val nameStart = j
          while (j < n && Character.isLetterOrDigit(html.charAt(j))) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          i = skipTagEnd(html, j)
          sepAny = true
          if (BlockTags.contains(name)) sepNewline = true
        }
        textStart = i
      } else i += 1
    }
    flushUpTo(math.min(i, n))
    sb.toString
  }

  /** Skip to just past the tag-closing `>`, honoring quoted attribute
    * values. Unterminated tags skip to end-of-input. */
  private def skipTagEnd(html: String, from: Int): Int = {
    var i = from
    var quote: Char = 0
    while (i < html.length) {
      val c = html.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return i + 1
      i += 1
    }
    i
  }

  /** Escape text-node content (&, <, >) — the minting inverse of the
    * entity decode, for fixtures and sinks. */
  def escapeText(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c => c.toString
    }

  /** Oracle-fixture page: head noise (title text kept, style/script
    * dropped) + three body blocks. For a 64-char WHITESPACE-FREE input
    * the extraction is exactly the four slices (8/16/20/20) joined by
    * newlines — the relational replay needs no tag machinery. */
  def mintFixture(t: String): String = {
    require(t.length == 64, s"fixture wants 64 chars, got ${t.length}")
    s"<html><head><title>${escapeText(t.substring(0, 8))}</title>" +
      "<style>p { color: red; }</style>" +
      "<script>var x = 1; if (x<2) { x = 3; }</script></head>" +
      s"""<body><h1 class="big" title="a>b">${escapeText(t.substring(8, 24))}</h1>""" +
      s"<p>${escapeText(t.substring(24, 44))}</p>" +
      s"<!-- comment --><div>${escapeText(t.substring(44, 64))}</div>" +
      "</body></html>"
  }
}
