package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Docx

/** DOCX extraction at the established codec bar: exact roundtrip
  * through the minting inverse, WordprocessingML structure semantics,
  * XML-set-only entity decoding, and poison conservatism (malformed
  * payloads degrade to None/empty — never a throw). */
class DocxSpec extends AnyFunSuite {

  private def rt(paragraphs: Seq[Seq[String]]): String =
    Docx.extractText(Docx.mint(paragraphs)).get

  test("roundtrip: paragraphs newline-joined, runs tab-joined, escapes decode") {
    assert(rt(Seq(Seq("hello world"))) === "hello world")
    assert(rt(Seq(Seq("a"), Seq("b"), Seq("c"))) === "a\nb\nc")
    assert(rt(Seq(Seq("x", "y"), Seq("z"))) === "x\ty\nz")
    // the XML escape roundtrip: &, <, > in text content
    assert(rt(Seq(Seq("a & b < c > d"))) === "a & b < c > d")
    // leading/trailing spaces in runs are literal (xml:space=preserve)
    assert(rt(Seq(Seq("  padded  "))) === "  padded  ")
    // many paragraphs, deterministic
    val paras = (0 until 50).map(i => Seq(s"line$i"))
    assert(rt(paras) === (0 until 50).map(i => s"line$i").mkString("\n"))
  }

  test("WordprocessingML semantics: br, tab, prefixes, CDATA, ignored data") {
    val ns = """xmlns:w="http://example/w""""
    // <w:br/> is a line break WITHIN a paragraph
    assert(Docx.extractXmlText(
      s"""<w:document $ns><w:body><w:p><w:r><w:t>a</w:t><w:br/>
         |<w:t>b</w:t></w:r></w:p></w:body></w:document>""".stripMargin,
      1 << 20) === "a\nb")
    // namespace prefix is irrelevant; bare tags count too
    assert(Docx.extractXmlText(
      "<doc><p><r><t>x</t><tab/><t>y</t></r></p></doc>", 1 << 20) === "x\ty")
    assert(Docx.extractXmlText(
      "<d><ns0:p><ns0:t>q</ns0:t></ns0:p></d>", 1 << 20) === "q")
    // character data OUTSIDE w:t is layout/properties, not text
    assert(Docx.extractXmlText(
      "<d><w:pPr>junk</w:pPr><w:t>keep</w:t></d>", 1 << 20) === "keep")
    // comments skipped; CDATA inside a run is literal
    assert(Docx.extractXmlText(
      "<d><!-- <w:t>no</w:t> --><w:t><![CDATA[a<b&c]]></w:t></d>",
      1 << 20) === "a<b&c")
    // consecutive paragraph ends collapse to one separator; no leading \n
    assert(Docx.extractXmlText(
      "<d><w:p/><w:p><w:t>a</w:t></w:p><w:p></w:p><w:p><w:t>b</w:t></w:p></d>",
      1 << 20) === "a\nb")
    // quote-aware attribute skip: a '>' inside an attribute value
    assert(Docx.extractXmlText(
      """<d><w:t note="x>y">ok</w:t></d>""", 1 << 20) === "ok")
    // maxOut cap is a hard output bound
    assert(Docx.extractXmlText("<d><w:t>abcdef</w:t></d>", 3) === "abc")
  }

  test("xmlUnescape: XML set only — HTML names stay literal") {
    assert(Docx.xmlUnescape("&amp;&lt;&gt;&quot;&apos;") === "&<>\"'")
    assert(Docx.xmlUnescape("&#65;&#x42;&#x63;") === "ABc")
    // astral-plane numeric reference
    assert(Docx.xmlUnescape("&#x1F600;") === new String(Character.toChars(0x1F600)))
    // NOT XML: HTML names, unterminated, junk, overlong — all literal
    assert(Docx.xmlUnescape("&nbsp;&bogus;&amp") === "&nbsp;&bogus;&amp")
    assert(Docx.xmlUnescape("&#xZZ;&#;") === "&#xZZ;&#;")
    assert(Docx.xmlUnescape("plain & text") === "plain & text")
  }

  test("poison: malformed payloads degrade, never throw") {
    // not a zip
    assert(Docx.extractText("not a zip at all".getBytes("UTF-8")).isEmpty)
    assert(Docx.extractText(Array.emptyByteArray).isEmpty)
    // a zip WITHOUT word/document.xml
    assert(Docx.extractText(graft.sources.Archives.zip(
      Seq("other.xml" -> "<a/>".getBytes("UTF-8")))).isEmpty)
    // truncated docx: every prefix length either extracts or returns None
    val good = Docx.mint(Seq(Seq("hello"), Seq("world")))
    for (len <- 0 until good.length by 7)
      Docx.extractText(good.take(len)) // must not throw
    // bit-flip sweep through the container
    for (pos <- 0 until good.length by 11) {
      val mutated = good.clone()
      mutated(pos) = (mutated(pos) ^ 0x55).toByte
      Docx.extractText(mutated) // must not throw
    }
    // hostile XML shapes: unterminated tag, unterminated CDATA/comment
    assert(Docx.extractXmlText("<w:t>abc", 100) === "abc")
    assert(Docx.extractXmlText("<w:t><![CDATA[abc", 100) === "abc")
    assert(Docx.extractXmlText("<!-- never closed <w:t>x</w:t>", 100) === "")
    assert(Docx.extractXmlText("<w:t", 100) === "")
    assert(Docx.extractXmlText(null, 100) === "")
    // decompression bomb: a huge deflated document.xml refuses at the
    // member cap during inflation (Archives wall), surfacing as None
    val bomb = graft.sources.Archives.zip(Seq(
      "word/document.xml" -> Array.fill[Byte](80 << 20)('a')))
    assert(Docx.extractText(bomb,
      maxOut = 1 << 20).isEmpty)
  }
}
