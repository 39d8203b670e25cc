package graft.functions

import java.util.regex.Matcher

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Minimal deterministic Markdown→HTML5 renderer (SURVEY §2.8 F10;
  * reference offline_reading.py:285-291 `render_markdown`).
  *
  * The reference escapes angle brackets then delegates to the python
  * `markdown` package. A full CommonMark engine is out of scope (and no
  * JVM markdown dependency is available offline), so this renders the
  * subset that dominates reddit bodies — paragraphs, `# headers` and
  * setext (`===`/`---` underline) headers, horizontal rules,
  * `&gt;`-quoted blockquotes (one nesting level), `-`/`*` and `1.` lists
  * (one nesting level via 2+-space indent), ``` fenced code blocks AND
  * 4-space-indented code blocks (reddit's classic code format; verbatim,
  * inline spans suppressed, blank lines kept), **bold**, *italic*,
  * `code`, [text](url) links, ![alt](url) images — with the same
  * escape-first contract. Tables are deliberately NOT rendered: the reference calls
  * `markdown.markdown(...)` with no extensions (offline_reading.py:290)
  * and python-markdown's `tables` support is an extension, so the
  * reference renders pipe-tables as paragraphs too.
  * Because escaping runs FIRST (the reference's order too), the
  * blockquote marker is matched in its ESCAPED form `&gt;` — which means
  * a body whose text LITERALLY contains `&gt;` at line start is
  * indistinguishable from a quote marker after the escape pass and
  * renders as a blockquote (accepted ambiguity of the escape-first
  * contract; the reference renders neither as a quote). Divergence
  * (documented, SURVEY §7.4.5): `>` escapes to the CORRECT `&gt;`, not
  * the reference's `&rt;` typo. Nesting deeper than one level renders
  * flat at the inner level — two levels cover the overwhelmingly common
  * reddit shapes; an unterminated fence swallows the rest of the body as
  * code (CommonMark's rule).
  *
  * Pure function of its input: safe as a codegen'd Catalyst expression
  * and inside distributed render tasks.
  */
object MarkdownLite {
  // Longest SPAN CONTENT the lazy-quantifier patterns will match. The JVM
  // regex engine recurses one stack frame per char of lazy-group content,
  // so an UNbounded `(.+?)` is a StackOverflowError (= a dead executor
  // thread) on a multi-KB span; `{1,2000}?` caps the recursion at ~2k
  // frames ≈ 300 KB of stack — safe under any sane -Xss. A span longer
  // than the bound renders literally; the surrounding PARAGRAPH can be
  // any length, and its other (short) spans still render — bounding the
  // span, not the block, avoids a long-prose rendering cliff.
  private val SpanMax = 2000
  // `(?<!\\)` on the opening backtick: an escaped backtick never opens a
  // code span (python-markdown's BACKTICK pattern has the same lookbehind)
  private val Code = "(?s)(?<!\\\\)`([^`]+)`".r
  private val Image = "!\\[([^\\]]*)\\]\\(([^)\\s]+)\\)".r
  private val Link = "\\[([^\\]]+)\\]\\(([^)\\s]+)\\)".r
  private val Bold = s"(?s)\\*\\*(.{1,$SpanMax}?)\\*\\*".r
  private val Ital = "(?s)(?<!\\*)\\*([^*]+)\\*(?!\\*)".r
  // Combined bold+italic needs explicit rules — Bold's reluctant group
  // would otherwise swallow the third marker asymmetrically
  // (`***x***` → `<strong>*x</strong>*`), and the UBold/UItal
  // word-boundary guards reject `___x___` outright.
  private val SBoth = s"(?s)\\*\\*\\*(?!\\*)(.{1,$SpanMax}?)\\*\\*\\*".r
  // Underscore emphasis is python-markdown's SMART form: only at word
  // boundaries, so snake_case_identifiers never emphasize.
  private val UBoth = s"(?s)(?<!\\w)___(?!_)(.{1,$SpanMax}?)(?<!_)___(?!\\w)".r
  private val UBold = s"(?s)(?<!\\w)__(?!_)(.{1,$SpanMax}?)(?<!_)__(?!\\w)".r
  private val UItal = s"(?s)(?<!\\w)_(?!_)(.{1,$SpanMax}?)(?<!_)_(?!\\w)".r
  // python-markdown ESCAPED_CHARS, minus <> (unreachable here: the
  // escape-first pass has already entity-encoded every angle bracket)
  private val Esc = "\\\\([\\\\`*_{}\\[\\]()#+.!-])".r
  // Autolink matches the ESCAPED form of <scheme://…> for the same reason.
  private val Auto = s"(?i)&lt;((?:https?|ftp)://[^<>]{0,$SpanMax}?)&gt;".r
  private val Header = "^(#{1,6})\\s+(.*)$".r
  private val HardBreak = java.util.regex.Pattern.compile(" {2,}\n")
  private val Restore = "\u0001(\\d+)\u0002".r

  /** Inline spans — order mirrors python-markdown's span precedence
    * (backticks > escapes > links > autolinks > emphasis). Spans whose
    * content must never be re-scanned by a LATER pass (code bodies,
    * escaped chars, URLs — all of which may contain `_`/`*`) are stashed
    * behind \u0001<idx>\u0002 placeholders and restored in one final
    * pass, python-markdown's own STX/ETX placeholder technique. */
  private def inline(p: String): String = {
    val stash = scala.collection.mutable.ArrayBuffer.empty[String]
    def put(html: String): String = {
      stash += html; "\u0001" + (stash.size - 1) + "\u0002"
    }
    var s = p
    s = Code.replaceAllIn(s, m =>
      Matcher.quoteReplacement(put(s"<code>${m.group(1)}</code>")))
    // hard line break: two+ trailing spaces before a newline (applied
    // after code spans so a break inside inline code stays verbatim);
    // cached Pattern — String.replaceAll recompiles per call, and this
    // runs per block per document inside distributed render tasks
    s = HardBreak.matcher(s).replaceAll("<br>\n")
    // a backslash-escaped marker becomes the literal char, protected
    // from every later span pattern
    s = Esc.replaceAllIn(s, m => Matcher.quoteReplacement(put(m.group(1))))
    // images before links: an image's bracket segment would otherwise
    // match the link pattern (leaving a stray `!`)
    s = Image.replaceAllIn(s, m =>
      Matcher.quoteReplacement(put(
        s"""<img alt="${m.group(1)}" src="${m.group(2)}">""")))
    // only the href is stashed: link TEXT still participates in the
    // emphasis passes below ([**b**](u) emphasizes; a `_`-ridden URL
    // never does)
    s = Link.replaceAllIn(s, m =>
      Matcher.quoteReplacement(
        s"""<a href="${put(m.group(2))}">${m.group(1)}</a>"""))
    // emphasis/autolink passes: SOE-safe at ANY block length because the
    // patterns themselves cap span content at SpanMax (see its docs) —
    // a short `*em*` inside a 10k-char paragraph still renders
    s = Auto.replaceAllIn(s, m =>
      Matcher.quoteReplacement(put(
        s"""<a href="${m.group(1)}">${m.group(1)}</a>""")))
    s = SBoth.replaceAllIn(s, m =>
      Matcher.quoteReplacement(s"<strong><em>${m.group(1)}</em></strong>"))
    s = Bold.replaceAllIn(s, m =>
      Matcher.quoteReplacement(s"<strong>${m.group(1)}</strong>"))
    s = UBoth.replaceAllIn(s, m =>
      Matcher.quoteReplacement(s"<strong><em>${m.group(1)}</em></strong>"))
    s = UBold.replaceAllIn(s, m =>
      Matcher.quoteReplacement(s"<strong>${m.group(1)}</strong>"))
    s = Ital.replaceAllIn(s, m =>
      Matcher.quoteReplacement(s"<em>${m.group(1)}</em>"))
    s = UItal.replaceAllIn(s, m =>
      Matcher.quoteReplacement(s"<em>${m.group(1)}</em>"))
    // restore: stashed strings come straight from the input (which had
    // placeholder chars stripped), so one pass suffices
    Restore.replaceAllIn(s, m =>
      Matcher.quoteReplacement(stash(m.group(1).toInt)))
  }

  private val TopUl = "^[-*]\\s+.*"
  private val TopOl = "^[0-9]+\\.\\s+.*"
  private val NestedItem = "^\\s{2,}(?:[-*]|[0-9]+\\.)\\s+.*"
  // hr: a line of 3+ identical -/*/_ markers, optionally spaced (`- - -`).
  // Checked BEFORE list matching — `- - -` also matches the ul marker.
  // A linear scan, NOT a regex: the natural `(?:-\s*){3,}` group loop
  // recurses one stack frame per repetition in java.util.regex and
  // StackOverflows on a multi-thousand-char marker run (RenderSpec's
  // adversarial floods pin this).
  private def isHrLine(l: String): Boolean = {
    val t = l.filterNot(_.isWhitespace)
    t.length >= 3 && "-*_".contains(t.head) && t.forall(_ == t.head)
  }
  private val SetextH1 = "^=+$"
  private val SetextH2 = "^-+$"
  private val IndentedCode = "^(?: {4}|\\t).*"

  private def stripMarker(l: String): String =
    l.trim.replaceFirst("^(?:[-*]|[0-9]+\\.)\\s+", "")

  /** List block with one nesting level: a 2+-space-indented marker line
    * attaches as a sublist of the preceding top-level item; the sublist's
    * tag follows ITS marker (an ordered sublist under an unordered list
    * works). Deeper indents flatten into the same sublist. */
  private def renderListBlock(rawLines: Seq[String], tag: String): String = {
    val items = scala.collection.mutable.ListBuffer
      .empty[(String, scala.collection.mutable.ListBuffer[String])]
    rawLines.foreach { l =>
      if (l.matches(NestedItem) && items.nonEmpty) items.last._2 += l
      else items += ((stripMarker(l), scala.collection.mutable.ListBuffer.empty[String]))
    }
    items.map { case (txt, nested) =>
      val sub =
        if (nested.isEmpty) ""
        else {
          val subTag = if (nested.head.trim.matches(TopOl)) "ol" else "ul"
          nested.map(n => s"<li>${inline(stripMarker(n))}</li>")
            .mkString(s"<$subTag>", "", s"</$subTag>")
        }
      s"<li>${inline(txt)}$sub</li>"
    }.mkString(s"<$tag>", "", s"</$tag>")
  }

  /** Blockquote with one nesting level: after stripping the outer `&gt;`
    * marker, runs of lines still carrying a marker become an inner
    * blockquote between the outer quote's paragraphs. */
  private def renderQuoteBlock(lines: Seq[String]): String = {
    val inner = lines.map(_.stripPrefix("&gt;").stripPrefix(" "))
    val parts = new StringBuilder
    var i = 0
    while (i < inner.length) {
      val isQ = inner(i).startsWith("&gt;")
      val run = inner.drop(i).takeWhile(_.startsWith("&gt;") == isQ)
      val body = run
        .map(l => if (isQ) l.stripPrefix("&gt;").stripPrefix(" ") else l)
        .mkString("\n")
      if (isQ) parts.append(s"<blockquote><p>${inline(body)}</p></blockquote>")
      else parts.append(s"<p>${inline(body)}</p>")
      i += run.length
    }
    s"<blockquote>$parts</blockquote>"
  }

  /** One blank-line-delimited block → one HTML block element. A block is
    * a list/quote only if EVERY line carries a marker (python-markdown's
    * lazy-continuation subtleties are out of subset). */
  private def renderBlock(b: String): String = {
    val rawLines = b.split("\n").toIndexedSeq
    val lines = rawLines.map(_.trim)
    b match {
      case Header(hashes, rest) if !b.contains("\n") =>
        val h = hashes.length
        s"<h$h>${inline(rest.trim)}</h$h>"
      // setext header: a 2-line block whose second line is all `=` (h1) or
      // all `-` (h2) and whose first line isn't itself a block marker
      case _ if lines.length == 2 && lines(0).nonEmpty &&
          (lines(1).matches(SetextH1) || lines(1).matches(SetextH2)) &&
          !lines(0).startsWith("&gt;") && !lines(0).startsWith("#") &&
          !lines(0).matches(TopUl) && !lines(0).matches(TopOl) =>
        val h = if (lines(1).startsWith("=")) 1 else 2
        s"<h$h>${inline(lines(0))}</h$h>"
      case _ if lines.forall(isHrLine) =>
        lines.map(_ => "<hr>").mkString
      case _ if lines.forall(_.startsWith("&gt;")) =>
        renderQuoteBlock(lines)
      case _ if rawLines.head.matches(TopUl) &&
          rawLines.forall(l => l.matches(TopUl) || l.matches(NestedItem)) =>
        renderListBlock(rawLines, "ul")
      case _ if rawLines.head.matches(TopOl) &&
          rawLines.forall(l => l.matches(TopOl) || l.matches(NestedItem)) =>
        renderListBlock(rawLines, "ol")
      case _ => s"<p>${inline(b)}</p>"
    }
  }

  def render(text: String): String = {
    if (text == null) return null
    // the stash/restore placeholder chars must not occur in body text —
    // strip them up front (python-markdown does the same for STX/ETX)
    val escaped = text.replace("\u0001", "").replace("\u0002", "")
      .replace("<", "&lt;").replace(">", "&gt;")
    // Fenced code regions are carved out BEFORE blank-line block splitting
    // (a fence may contain blank lines) and rendered verbatim — the
    // escape pass already ran, inline spans never apply.
    val lines = escaped.split("\n", -1)
    val out = List.newBuilder[String]
    val buf = new StringBuilder
    def flushBuf(): Unit = {
      buf.toString.split("\n{2,}").iterator.map(_.trim).filter(_.nonEmpty)
        .foreach(b => out += renderBlock(b))
      buf.clear()
    }
    var i = 0
    // an indented line opens a code block only at a block boundary — right
    // after a blank line (or at the start). An indented line inside a
    // paragraph/list block is a lazy continuation, not code.
    var atBoundary = true
    while (i < lines.length) {
      if (lines(i).trim.startsWith("```")) {
        flushBuf()
        val fence = new StringBuilder
        i += 1    // info string on the opening fence is dropped
        while (i < lines.length && !lines(i).trim.startsWith("```")) {
          fence.append(lines(i)).append('\n')
          i += 1
        }
        if (i < lines.length) i += 1   // consume the closing fence
        out += s"<pre><code>$fence</code></pre>"
        atBoundary = true
      } else if (atBoundary && lines(i).matches(IndentedCode) &&
          lines(i).trim.nonEmpty) {
        flushBuf()
        // collect indented-or-blank lines; a blank inside stays in the
        // block (python-markdown's rule), trailing blanks are dropped
        val code = scala.collection.mutable.ListBuffer.empty[String]
        while (i < lines.length &&
            (lines(i).trim.isEmpty || lines(i).matches(IndentedCode))) {
          code += lines(i).replaceFirst("^(?: {4}|\t)", "")
          i += 1
        }
        while (code.nonEmpty && code.last.trim.isEmpty) code.remove(code.length - 1)
        out += s"<pre><code>${code.mkString("\n")}\n</code></pre>"
        // the consumed trailing blanks already separated us from what follows
      } else {
        atBoundary = lines(i).trim.isEmpty
        buf.append(lines(i)).append('\n')
        i += 1
      }
    }
    flushBuf()
    out.result().mkString("\n")
  }

  def renderUTF8(u: UTF8String): UTF8String =
    if (u == null) null else UTF8String.fromString(render(u.toString))
}

/** Column-level markdown render as a native Expression (same pattern as
  * [[HtmlUnescape]] — stays inside whole-stage codegen). */
case class MarkdownRender(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MarkdownLite.renderUTF8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MarkdownLite.renderUTF8($c)")

  override protected def withNewChildInternal(newChild: Expression): MarkdownRender =
    copy(child = newChild)
}
