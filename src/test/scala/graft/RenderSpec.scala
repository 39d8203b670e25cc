package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.render.OfflineReading
import graft.render.OfflineReading.{ComRow, SubRow}

class RenderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sub = SubRow("t3_a", "A Title", "alice", 1000L, 42L, "test",
    None, Some("hello **world**"))

  test("F10 markdown subset: paragraphs, bold, italic, code, links, escape") {
    import graft.functions.MarkdownLite.render
    assert(render("plain") === "<p>plain</p>")
    assert(render("a\n\nb") === "<p>a</p>\n<p>b</p>")
    assert(render("**bold** and *em*") === "<p><strong>bold</strong> and <em>em</em></p>")
    assert(render("`x < y`") === "<p><code>x &lt; y</code></p>")
    assert(render("[click](https://x.com/a)") ===
      """<p><a href="https://x.com/a">click</a></p>""")
    // image beats link (the `!` must not survive as a stray character)
    assert(render("![a cat](https://x.com/c.png)") ===
      """<p><img alt="a cat" src="https://x.com/c.png"></p>""")
    assert(render("see ![](u.png) and [l](v)") ===
      """<p>see <img alt="" src="u.png"> and <a href="v">l</a></p>""")
    // escape-first contract; correct &gt; (divergence from reference &rt;)
    assert(render("<b>raw</b>") === "<p>&lt;b&gt;raw&lt;/b&gt;</p>")
  }

  test("F10 markdown blocks: headers, blockquotes, lists") {
    import graft.functions.MarkdownLite.render
    // ATX headers, h1-h6, with inline spans
    assert(render("# Title") === "<h1>Title</h1>")
    assert(render("### Sub **head**") === "<h3>Sub <strong>head</strong></h3>")
    assert(render("###### deep") === "<h6>deep</h6>")
    assert(render("####### seven") === "<p>####### seven</p>")   // >6 → paragraph
    assert(render("#nospace") === "<p>#nospace</p>")
    // blockquote — matched in ESCAPED form (escape-first contract)
    assert(render("> quoted *text*") ===
      "<blockquote><p>quoted <em>text</em></p></blockquote>")
    assert(render("> line one\n> line two") ===
      "<blockquote><p>line one\nline two</p></blockquote>")
    // mid-line > is NOT a quote
    assert(render("5 > 3") === "<p>5 &gt; 3</p>")
    // unordered lists, - and * markers
    assert(render("- a\n- b") === "<ul><li>a</li><li>b</li></ul>")
    assert(render("* a **x**\n* b") ===
      "<ul><li>a <strong>x</strong></li><li>b</li></ul>")
    // ordered list
    assert(render("1. one\n2. two\n3. three") ===
      "<ol><li>one</li><li>two</li><li>three</li></ol>")
    // a lone *emphasis* line is not a bullet (marker needs trailing space)
    assert(render("*em*") === "<p><em>em</em></p>")
    // mixed-marker block falls back to paragraph (not silently a list)
    assert(render("- a\nplain") === "<p>- a\nplain</p>")
    // blocks compose in document order
    assert(render("# H\n\n> q\n\n- i\n\npara") ===
      "<h1>H</h1>\n<blockquote><p>q</p></blockquote>\n<ul><li>i</li></ul>\n<p>para</p>")
  }

  test("F10 markdown fenced code blocks: verbatim, blank lines kept, spans suppressed") {
    import graft.functions.MarkdownLite.render
    assert(render("```\nval x = 1\n```") ===
      "<pre><code>val x = 1\n</code></pre>")
    // info string dropped; ESCAPED contents stay verbatim — no <em>, no <a>
    assert(render("```scala\nif (a < b) *not em* [x](y)\n```") ===
      "<pre><code>if (a &lt; b) *not em* [x](y)\n</code></pre>")
    // a blank line inside the fence does NOT split the block
    assert(render("```\nline one\n\nline two\n```") ===
      "<pre><code>line one\n\nline two\n</code></pre>")
    // prose around the fence renders normally
    assert(render("before\n\n```\ncode\n```\nafter") ===
      "<p>before</p>\n<pre><code>code\n</code></pre>\n<p>after</p>")
    // unterminated fence swallows the rest (CommonMark)
    assert(render("```\nno close\nstill code") ===
      "<pre><code>no close\nstill code\n</code></pre>")
    // inline single-backtick code is untouched by the fence pass
    assert(render("a `b` c") === "<p>a <code>b</code> c</p>")
  }

  test("F10 markdown one-level nesting: lists and blockquotes") {
    import graft.functions.MarkdownLite.render
    // indented markers nest under the preceding top-level item
    assert(render("- a\n  - a1\n  - a2\n- b") ===
      "<ul><li>a<ul><li>a1</li><li>a2</li></ul></li><li>b</li></ul>")
    // ordered sublist under an unordered parent keeps its own tag
    assert(render("- a\n  1. one\n  2. two") ===
      "<ul><li>a<ol><li>one</li><li>two</li></ol></li></ul>")
    // ordered parent with unordered sublist
    assert(render("1. a\n  - x\n2. b") ===
      "<ol><li>a<ul><li>x</li></ul></li><li>b</li></ol>")
    // deeper indents flatten into the same sublist (one level only)
    assert(render("- a\n  - a1\n    - a1i") ===
      "<ul><li>a<ul><li>a1</li><li>a1i</li></ul></li></ul>")
    // flat lists unchanged
    assert(render("- a\n- b") === "<ul><li>a</li><li>b</li></ul>")
    // nested blockquote: > > inner between outer paragraphs
    assert(render("> outer\n> > inner\n> back") ===
      "<blockquote><p>outer</p><blockquote><p>inner</p></blockquote>" +
        "<p>back</p></blockquote>")
    // all-nested quote renders as quote-in-quote
    assert(render("> > only inner") ===
      "<blockquote><blockquote><p>only inner</p></blockquote></blockquote>")
    // flat quotes unchanged
    assert(render("> a\n> b") === "<blockquote><p>a\nb</p></blockquote>")
  }

  test("F10 markdown indented code, setext headers, horizontal rules") {
    import graft.functions.MarkdownLite.render
    // 4-space-indented code (reddit's classic code format): verbatim,
    // dedented, spans suppressed
    assert(render("    val x = 1") === "<pre><code>val x = 1\n</code></pre>")
    assert(render("    if (a < b) *no em*\n    line2") ===
      "<pre><code>if (a &lt; b) *no em*\nline2\n</code></pre>")
    // a blank line inside an indented run stays in ONE code block
    assert(render("    one\n\n    two") ===
      "<pre><code>one\n\ntwo\n</code></pre>")
    // tab indent works; prose around the block renders normally
    assert(render("para\n\n\tcode\n\nafter") ===
      "<p>para</p>\n<pre><code>code\n</code></pre>\n<p>after</p>")
    // an indented line directly under a paragraph line is a lazy
    // continuation, NOT code
    assert(render("para\n    still para") === "<p>para\n    still para</p>")
    // deep list indents still flatten into the sublist, not code
    assert(render("- a\n  - a1\n    - a1i") ===
      "<ul><li>a<ul><li>a1</li><li>a1i</li></ul></li></ul>")
    // setext headers: = underline → h1, - underline → h2, spans apply
    assert(render("Title\n=====") === "<h1>Title</h1>")
    assert(render("Sub **t**\n---") === "<h2>Sub <strong>t</strong></h2>")
    // horizontal rules, all three markers, spaced form, before-list rule
    assert(render("***") === "<hr>")
    assert(render("___") === "<hr>")
    assert(render("- - -") === "<hr>")
    assert(render("a\n\n---\n\nb") === "<p>a</p>\n<hr>\n<p>b</p>")
    // `---` directly under text is setext h2, not an hr
    assert(render("head\n---") === "<h2>head</h2>")
    // tables are out of subset (reference uses no python-markdown
    // extensions): pipes render as a paragraph
    assert(render("|a|b|\n|-|-|\n|1|2|") === "<p>|a|b|\n|-|-|\n|1|2|</p>")
  }

  test("F10 markdown inline tail: underscore emphasis, hard breaks, autolinks, escapes") {
    import graft.functions.MarkdownLite.render
    // smart underscore emphasis: word-boundary only
    assert(render("hello _world_ again") === "<p>hello <em>world</em> again</p>")
    assert(render("a __big deal__ here") === "<p>a <strong>big deal</strong> here</p>")
    assert(render("snake_case_name stays") === "<p>snake_case_name stays</p>")
    assert(render("a__b__c stays") === "<p>a__b__c stays</p>")
    // two trailing spaces → hard break; one space does not
    assert(render("line one  \nline two") === "<p>line one<br>\nline two</p>")
    assert(render("one \ntwo") === "<p>one \ntwo</p>")
    // autolinks (matched in their escaped form), URL chars left intact
    assert(render("see <http://example.com/a_b?x=1&y=2> now") ===
      """<p>see <a href="http://example.com/a_b?x=1&y=2">http://example.com/a_b?x=1&y=2</a> now</p>""")
    assert(render("<ftp://host/file>") ===
      """<p><a href="ftp://host/file">ftp://host/file</a></p>""")
    // backslash escapes make markers literal
    assert(render("literal \\*not em\\* and \\_plain\\_") ===
      "<p>literal *not em* and _plain_</p>")
    assert(render("escaped backtick \\`not code\\`") ===
      "<p>escaped backtick `not code`</p>")
    // code-span bodies are protected from EVERY later span pass
    assert(render("`code_with_under` and *em*") ===
      "<p><code>code_with_under</code> and <em>em</em></p>")
    assert(render("x `a **b** c` y") === "<p>x <code>a **b** c</code> y</p>")
    // link text emphasizes; a `_`-ridden href does not
    assert(render("[**bold link**](http://x.com/a_b)") ===
      """<p><a href="http://x.com/a_b"><strong>bold link</strong></a></p>""")
    // combined emphasis, both marker families
    assert(render("***both***") === "<p><strong><em>both</em></strong></p>")
    assert(render("___both___") === "<p><strong><em>both</em></strong></p>")
  }

  test("short spans inside LONG paragraphs still emphasize (span bound, not block bound)") {
    import graft.functions.MarkdownLite.render
    // a 10k-char paragraph of ordinary prose with small spans — bounding
    // the whole block would silently drop these (the regression this pins)
    val prose = ("lorem ipsum dolor sit amet " * 400).trim
    val body = s"$prose *em* and __st__ and <http://x.io/a> tail"
    val out = render(body)
    assert(out.contains("<em>em</em>"), "emphasis lost in long paragraph")
    assert(out.contains("<strong>st</strong>"))
    assert(out.contains("""<a href="http://x.io/a">"""))
    // while a span LONGER than the bound renders literally (and safely)
    val huge = "**" + ("y" * 3000) + "**"
    assert(render(huge) === s"<p>$huge</p>")
  }

  test("markdown renderer fuzz: 500 seeded random marker-dense bodies render without throwing") {
    import graft.functions.MarkdownLite.render
    val rnd = new scala.util.Random(20260813L)   // deterministic corpus
    val alphabet = "ab c\nd*_`[]()#>!\\-=.|~é中 "   // markers + text + unicode
    (1 to 500).foreach { i =>
      val len = 1 + rnd.nextInt(800)
      val s = Array.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
      val out = render(s)
      assert(out != null, s"fuzz case $i (seed-derived) broke render")
      // a body with any visible char always renders at least one block
      if (s.exists(!_.isWhitespace)) assert(out.nonEmpty, s"fuzz case $i rendered empty")
    }
  }

  test("markdown renderer is total: adversarial marker floods terminate, never throw") {
    import graft.functions.MarkdownLite.render
    // regex-heavy renderers die on pathological inputs via catastrophic
    // backtracking — these must complete (bounded seconds) and not throw
    val floods = Seq(
      "_" * 5000, "*" * 5000, "`" * 5001, "\\" * 5000,
      ("__a" * 1500) + "b",              // many openers, no closer
      ("[x](y" * 1000),                  // unclosed links
      ("> " * 2000) + "q",
      ("  \n" * 2000),                   // hard-break flood
      ("<http://a" * 1000),              // unclosed autolinks
      (1 to 500).map(i => s"$i. x").mkString("\n"))
    floods.foreach { f =>
      val t0 = System.nanoTime()
      val out = render(f)
      assert(out != null)
      assert((System.nanoTime() - t0) / 1e9 < 10.0, "pathological input too slow")
    }
  }

  test("markdownRender expression works column-level") {
    import spark.implicits._
    val out = Seq("**hi**").toDF("t")
      .select(graft.functions.markdownRender($"t")).head().getString(0)
    assert(out === "<p><strong>hi</strong></p>")
  }

  test("thread render: nesting, score-desc siblings, deleted author, url branch") {
    val comments = Array(
      ComRow("t1_c1", "t3_a", "t3_a", "bob", 1001L, 5L, "first"),
      ComRow("t1_c2", "t3_a", "t3_a", "[deleted]", 1002L, 9L, "top scorer"),
      ComRow("t1_c3", "t3_a", "t1_c1", "carol", 1003L, 1L, "reply to c1"),
      ComRow("t1_c4", "t3_a", "t1_missing", "dan", 1004L, 2L, "orphan → root"))
    val html = OfflineReading.renderThread(sub, comments)
    // submission header + selftext markdown
    assert(html.contains("<title>A Title</title>"))
    assert(html.contains("<p><p>hello <strong>world</strong></p></p>"))
    // score-desc root order: c2 (9) before c4 (2) before c1 (5)? no — c1=5 > c4=2
    val i2 = html.indexOf("id=\"t1_c2\""); val i1 = html.indexOf("id=\"t1_c1\"")
    val i4 = html.indexOf("id=\"t1_c4\""); val i3 = html.indexOf("id=\"t1_c3\"")
    assert(i2 >= 0 && i1 >= 0 && i4 >= 0 && i3 >= 0)
    assert(i2 < i1 && i1 < i4)          // 9 > 5 > 2 at root level
    assert(i3 > i1)                     // nested reply after its parent opens
    // c3 nested INSIDE c1's div: find c1's collapsible span containing c3
    assert(html.contains("[deleted]"))  // deleted author not linked
    assert(!html.contains("""u/[deleted]"""))
    // url branch: a url-submission renders an <a>, not selftext
    val withUrl = sub.copy(url = Some("https://ex.com/x"), selftext = None)
    assert(OfflineReading.renderThread(withUrl, Array.empty)
      .contains("""<a href="https://ex.com/x">https://ex.com/x</a>"""))
  }

  test("distributed cogroup render + S8 per-thread file sink") {
    val spark2 = spark
    import spark2.implicits._
    val subs = Seq(
      sub, sub.copy(idstr = "t3_b", title = "B", selftext = Some("b text"))).toDS()
    val coms = Seq(
      ComRow("t1_x", "t3_a", "t3_a", "bob", 1L, 1L, "x"),
      ComRow("t1_y", "t3_zzz", "t3_zzz", "eve", 1L, 1L, "orphan thread")).toDS()
    val pages = OfflineReading.htmlForThreads(subs, coms).collect().toMap
    assert(pages.keySet === Set("t3_a", "t3_b"))       // orphan thread dropped
    assert(pages("t3_a").contains("id=\"t1_x\""))
    assert(pages("t3_b").contains("<p>b text</p>"))
    val out = java.nio.file.Files.createTempDirectory("render").toString
    OfflineReading.writeHtmlFiles(OfflineReading.htmlForThreads(subs, coms), out)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(out, "t3_a.html")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(out, "t3_b.html")))
  }
}
