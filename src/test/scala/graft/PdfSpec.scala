package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pdf

/** PDF text extraction: exact roundtrips through both stream filters,
  * every text operator and escape form, and the poison contract. */
class PdfSpec extends AnyFunSuite {

  test("roundtrip: minted page text extracts exactly, raw and FlateDecode") {
    val texts = Seq(
      "Hello, world!",
      "parens (nested (deep)) and \\ backslash",
      "tabs\tand\nnewlines preserved",
      "x" * 500)
    for (t <- texts; flate <- Seq(false, true)) {
      val pdf = Pdf.minimal(Seq(t), flate)
      assert(new String(pdf.take(5), "ISO-8859-1") === "%PDF-")
      assert(Pdf.extractText(pdf) === Some(t), s"flate=$flate text=$t")
    }
  }

  test("multi-page: pages join with the line-move newline heuristic") {
    val pdf = Pdf.minimal(Seq("page one", "page two", "page three"), flate = true)
    assert(Pdf.extractText(pdf) === Some("page one\npage two\npage three"))
  }

  test("text operators: TJ arrays with kerning, hex strings, quote ops") {
    // hand-built content streams through a raw container
    def docWith(content: String): Array[Byte] = {
      val pdf = Pdf.minimal(Seq("PLACEHOLDER"), flate = false)
      val s = new String(pdf, "ISO-8859-1")
      s.replace("BT /F1 12 Tf 72 720 Td (PLACEHOLDER) Tj ET", content)
        .replaceFirst("/Length \\d+",
          s"/Length ${content.getBytes("ISO-8859-1").length}")
        .getBytes("ISO-8859-1")
    }
    assert(Pdf.extractText(docWith(
      "BT [(Hel) -20 (lo) 5 ( wor) (ld)] TJ ET")) === Some("Hello world"))
    assert(Pdf.extractText(docWith(
      "BT <48656C6C6F> Tj ET")) === Some("Hello"))
    // odd hex digit count: final digit is high nibble, low = 0
    assert(Pdf.extractText(docWith("BT <48656C6C6F2> Tj ET")) === Some("Hello "))
    // the ' operator shows its string; octal escapes decode
    assert(Pdf.extractText(docWith("BT (line\\040two) ' ET")) === Some("line two"))
    // strings NOT followed by a text operator are ignored
    assert(Pdf.extractText(docWith("BT (ignored) (shown) Tj ET")) === Some("shown"))
  }

  test("poison: non-PDF is None; torn internals and bombs degrade, never throw") {
    assert(Pdf.extractText("not a pdf at all".getBytes) === None)
    assert(Pdf.extractText(Array.emptyByteArray) === None)
    val good = Pdf.minimal(Seq("survivor"), flate = true)
    // truncate at every 97th byte: must never throw
    var i = 5
    while (i < good.length) {
      Pdf.extractText(good.take(i))
      i += 97
    }
    // random corruption: never throws
    val rng = new scala.util.Random(29)
    for (_ <- 1 to 200) {
      val m = good.clone()
      for (_ <- 0 to rng.nextInt(4)) m(rng.nextInt(m.length)) = rng.nextInt(256).toByte
      Pdf.extractText(m)
    }
    // deflate bomb inside a /FlateDecode stream: capped during
    // inflation — extraction completes (other pages still extract),
    // cost is bounded by the cap
    val bombText = "A" * 100
    val pdf = Pdf.minimal(Seq(bombText, "after"), flate = true)
    assert(Pdf.extractText(pdf, maxOut = 1 << 20) === Some(bombText + "\nafter"))
    val zeros = "B" * 200000
    val big = Pdf.minimal(Seq(zeros), flate = true)
    // cap below the decompressed size: the stream is refused, text empty
    assert(Pdf.extractText(big, maxOut = 1000) === Some(""))
    succeed
  }
}
