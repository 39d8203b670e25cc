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
  * subset that dominates reddit bodies — paragraphs, `# headers`,
  * `&gt;`-quoted blockquotes, `-`/`*` and `1.` lists, **bold**, *italic*,
  * `code`, [text](url) links — with the same escape-first contract.
  * Because escaping runs FIRST (the reference's order too), the
  * blockquote marker is matched in its ESCAPED form `&gt;` — which means
  * a body whose text LITERALLY contains `&gt;` at line start is
  * indistinguishable from a quote marker after the escape pass and
  * renders as a blockquote (accepted ambiguity of the escape-first
  * contract; the reference renders neither as a quote). Divergence
  * (documented, SURVEY §7.4.5): `>` escapes to the CORRECT `&gt;`, not
  * the reference's `&rt;` typo. Nested lists/quotes render flat — one
  * level, the overwhelmingly common reddit shape.
  *
  * Pure function of its input: safe as a codegen'd Catalyst expression
  * and inside distributed render tasks.
  */
object MarkdownLite {
  private val Code = "`([^`]+)`".r
  private val Link = "\\[([^\\]]+)\\]\\(([^)\\s]+)\\)".r
  private val Bold = "(?s)\\*\\*(.+?)\\*\\*".r
  private val Ital = "(?s)(?<!\\*)\\*([^*]+)\\*(?!\\*)".r
  private val Header = "^(#{1,6})\\s+(.*)$".r

  /** Inline spans — order matters: code wins over links wins over
    * emphasis, mirroring python-markdown's span precedence. */
  private def inline(p: String): String = {
    var s = p
    s = Code.replaceAllIn(s, m =>
      Matcher.quoteReplacement(s"<code>${m.group(1)}</code>"))
    s = Link.replaceAllIn(s, m =>
      Matcher.quoteReplacement(s"""<a href="${m.group(2)}">${m.group(1)}</a>"""))
    s = Bold.replaceAllIn(s, m =>
      Matcher.quoteReplacement(s"<strong>${m.group(1)}</strong>"))
    s = Ital.replaceAllIn(s, m =>
      Matcher.quoteReplacement(s"<em>${m.group(1)}</em>"))
    s
  }

  /** One blank-line-delimited block → one HTML block element. A block is
    * a list/quote only if EVERY line carries the marker (python-markdown's
    * lazy-continuation subtleties are out of subset). */
  private def renderBlock(b: String): String = {
    val lines = b.split("\n").toIndexedSeq.map(_.trim)
    b match {
      case Header(hashes, rest) if !b.contains("\n") =>
        val h = hashes.length
        s"<h$h>${inline(rest.trim)}</h$h>"
      case _ if lines.forall(_.startsWith("&gt;")) =>
        val inner = lines.map(_.stripPrefix("&gt;").stripPrefix(" ")).mkString("\n")
        s"<blockquote><p>${inline(inner)}</p></blockquote>"
      case _ if lines.forall(_.matches("^[-*]\\s+.*")) =>
        lines.map(l => s"<li>${inline(l.replaceFirst("^[-*]\\s+", ""))}</li>")
          .mkString("<ul>", "", "</ul>")
      case _ if lines.forall(_.matches("^[0-9]+\\.\\s+.*")) =>
        lines.map(l => s"<li>${inline(l.replaceFirst("^[0-9]+\\.\\s+", ""))}</li>")
          .mkString("<ol>", "", "</ol>")
      case _ => s"<p>${inline(b)}</p>"
    }
  }

  def render(text: String): String = {
    if (text == null) return null
    val escaped = text.replace("<", "&lt;").replace(">", "&gt;")
    val blocks = escaped.split("\n{2,}").iterator.map(_.trim).filter(_.nonEmpty)
    blocks.map(renderBlock).mkString("\n")
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
