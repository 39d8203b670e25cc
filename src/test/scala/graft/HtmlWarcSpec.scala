package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Guard, Html}
import graft.sources.{Archives, Warc}

/** HTML text extraction + WARC record walk: exact fixtures, the
  * whitespace/entity/skip semantics, torn-input robustness, and the
  * shed-receipt contract. */
class HtmlWarcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("html: block/inline separation, entity decode, skips") {
    assert(Html.extractText("<p>one</p><p>two</p>") === "one\ntwo")
    assert(Html.extractText("a<b>bold</b>c") === "a bold c")
    assert(Html.extractText("<div>x &amp; y &lt;z&gt;</div>") === "x & y <z>")
    assert(Html.extractText(
      "<style>p{color:red}</style>keep<script>var a='<p>no</p>';</script>") === "keep")
    assert(Html.extractText("<!-- gone -->kept<![CDATA[ gone ]]>") === "kept")
    // quote-aware attribute skip: '>' inside a quoted attr doesn't close
    assert(Html.extractText("""<img alt="a>b">after""") === "after")
    // whitespace collapse: runs with a newline become one newline
    assert(Html.extractText("a  \n  b\t\tc") === "a\nb c")
    // unterminated script: bounded, no hang
    assert(Html.extractText("before<script>never closed") === "before")
    assert(Html.extractText(null) === "")
    // output cap
    assert(Html.extractText("<p>" + "y" * 100 + "</p>", maxOut = 10).length === 10)
  }

  test("html: fixture extracts to the slice join exactly") {
    val t = (0 until 64).map(i => (33 + (i * 7) % 94).toChar).mkString
    assert(t.length === 64 && !t.contains(' '))
    val got = Html.extractText(Html.mintFixture(t))
    assert(got === Seq(t.substring(0, 8), t.substring(8, 24),
      t.substring(24, 44), t.substring(44, 64)).mkString("\n"))
    // escape roundtrip on the hostile chars specifically
    val hostile = "a&b<c>d" + "x" * 57
    assert(Html.extractText(Html.mintFixture(hostile.take(64)))
      .replace("\n", "") === hostile.take(64))
  }

  test("warc: mint → parse roundtrip, bare and per-record-gzip") {
    val recs = Seq(
      ("http://a/1", "text/html", "<p>hi</p>".getBytes("ISO-8859-1")),
      ("http://a/2", "text/plain", "plain body".getBytes("ISO-8859-1")))
    for (gz <- Seq(false, true)) {
      val payload = Warc.mint(recs, gzipPerRecord = gz)
      val raw = if (gz) Archives.gunzip(payload).get else payload
      val parsed = Warc.parseRecords(raw)
      assert(parsed.isDefined, s"gz=$gz")
      val ps = parsed.get
      assert(ps.map(_._2) === Seq("http://a/1", "http://a/2"))
      assert(ps.map(_._3) === Seq(200, 200))
      assert(ps.map(_._4) === Seq("text/html", "text/plain"))
      assert(new String(ps(1)._5, "ISO-8859-1") === "plain body")
    }
  }

  test("warc: explode rows, caps, torn payloads shed loudly") {
    import spark.implicits._
    val good = Warc.mint(Seq(("http://g/0", "text/plain", "abc".getBytes)),
      gzipPerRecord = true)
    val bare = Warc.mint(Seq(("http://g/1", "text/plain", "xyz".getBytes)))
    val torn = bare.take(bare.length - 10)          // block truncated
    val junk = Array.fill(80)(3.toByte)
    val df = Seq((1L, good), (2L, bare), (3L, torn), (4L, junk))
      .toDF("doc_id", "payload")
    val out = Warc.explode(df, "doc_id", "payload")
    val rows = out.collect().sortBy(_.doc_id)
    assert(rows.map(r => (r.doc_id, r.ok, r.target_uri)).toSeq === Seq(
      (1L, true, "http://g/0"), (2L, true, "http://g/1"),
      (3L, false, null), (4L, false, null)))
    assert(new String(rows(0).body) === "abc")
    assert(rows(0).http_status === 200)
    val ms = out.queryExecution.observedMetrics.collect {
      case (k, row) if k.startsWith(Guard.ShedMetricPrefix + "warcPayloads") => row
    }
    assert(ms.size === 1 && ms.head.getAs[Long]("shed_payloads") === 2L)
    // record-count cap
    val many = Warc.mint((1 to 30).map(i =>
      (s"http://m/$i", "text/plain", "b".getBytes)))
    assert(Warc.parseRecords(many, recordCap = 10) === None)
    assert(Warc.parseRecords(many).get.size === 30)
    // body cap
    val fat = Warc.mint(Seq(("http://f/0", "text/plain", new Array[Byte](5000))))
    assert(Warc.parseRecords(fat, bodyCap = 1000) === None)
  }
}
