package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def eval(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c).head().get(0)

  test("F1 base36 decode matches reference examples (common.py:43-65)") {
    assert(eval(b36decode(lit("0"))) === 0L)
    assert(eval(b36decode(lit("z"))) === 35L)
    assert(eval(b36decode(lit("10"))) === 36L)
    assert(eval(b36decode(lit("aaa111"))) === java.lang.Long.parseLong("aaa111", 36))
  }

  test("F1 base36 round-trip property: decode(encode(n)) == n") {
    val rng = new scala.util.Random(42)
    val samples = Seq(0L, 1L, 35L, 36L, 1295L, 1296L) ++
      Seq.fill(200)(math.abs(rng.nextLong()) % 4738381338321616895L) // < 36^12
    import spark.implicits._
    val got = samples.toDF("n")
      .select(col("n"), b36decode(b36encode(col("n"))).as("rt"))
      .filter(col("n") =!= col("rt")).count()
    assert(got === 0L)
  }

  test("F1 encode is lowercase (reddit convention)") {
    assert(eval(b36encode(lit(java.lang.Long.parseLong("abc123", 36)))) === "abc123")
  }

  test("F2 fullname prefixes are idempotent") {
    assert(eval(t3Prefix(lit("abc"))) === "t3_abc")
    assert(eval(t3Prefix(lit("t3_abc"))) === "t3_abc")
    assert(eval(t1Prefix(lit("abc"))) === "t1_abc")
    assert(eval(stripTypePrefix(lit("t3_abc"))) === "abc")
    assert(eval(stripTypePrefix(lit("abc"))) === "abc")
  }

  test("F7 html unescape: named, numeric, hex, malformed (pushshift.py:72-73)") {
    assert(eval(htmlUnescape(lit("a &amp; b"))) === "a & b")
    assert(eval(htmlUnescape(lit("&lt;tag&gt;"))) === "<tag>")
    assert(eval(htmlUnescape(lit("it&#39;s"))) === "it's")
    assert(eval(htmlUnescape(lit("&#x41;BC"))) === "ABC")
    assert(eval(htmlUnescape(lit("no entities"))) === "no entities")
    assert(eval(htmlUnescape(lit("dangling & amp"))) === "dangling & amp")
    assert(eval(htmlUnescape(lit("&bogus;"))) === "&bogus;")
    assert(eval(htmlUnescape(lit(null).cast("string"))) === null)
  }

  test("F3/F4 timestamp formats (common.py:94-97; index.py:17)") {
    assert(eval(humanTime(lit(1371043059L))) === "Jun 12 2013 13:17:39")
    assert(eval(indexTime(lit(1371043059L))) === "2013 Jun 12")
  }

  test("F8/F9 escapes: correct &gt; (divergence from reference &rt; bug)") {
    assert(eval(htmlEscapeBrackets(lit("<a>"))) === "&lt;a&gt;")
    assert(eval(sanitizeBraces(lit("{x}"))) === "{{x}}")
  }

  test("F11 splitAny on + space comma (common.py:135-140)") {
    val got = spark.range(1).select(splitAny(lit("a+b c,d"))).head().getSeq[String](0)
    assert(got === Seq("a", "b", "c", "d"))
  }

  test("F16 author sentinel") {
    assert(eval(authorOrDeleted(lit(null).cast("string"))) === "[DELETED]")
    assert(eval(authorOrDeleted(lit("alice"))) === "alice")
  }

  test("F17 links") {
    assert(eval(shortLink(lit("t3_abc"))) === "https://redd.it/abc")
    assert(eval(permalink(lit("test"), lit("t3_abc"))) ===
      "https://reddit.com/r/test/comments/abc")
  }

  test("unicode canonicalization: NFC recompose, NFKC fold, accent strip, ASCII fast path") {
    import org.apache.spark.sql.functions.lit
    // decomposed e+combining acute recomposes to precomposed \u00e9
    assert(eval(unicodeNfc(lit("cafe\u0301"))) === "caf\u00e9")
    // already-NFC input is untouched; pure ASCII identity
    assert(eval(unicodeNfc(lit("caf\u00e9"))) === "caf\u00e9")
    assert(eval(unicodeNfc(lit("plain"))) === "plain")
    // NFKC folds compatibility forms NFC leaves alone
    assert(eval(unicodeNfkc(lit("\uff11\uff12"))) === "12")   // full-width digits
    assert(eval(unicodeNfkc(lit("\ufb01le"))) === "file")      // fi ligature
    assert(eval(unicodeNfc(lit("\uff11"))) === "\uff11")      // NFC does NOT
    // accent strip: marks vanish, base letters stay, from EITHER form
    assert(eval(stripAccents(lit("caf\u00e9"))) === "cafe")
    assert(eval(stripAccents(lit("cafe\u0301"))) === "cafe")
    assert(eval(stripAccents(lit("na\u00efve"))) === "naive")
    // \u00df is a letter, not a mark — folding must not eat it
    assert(eval(stripAccents(lit("stra\u00dfe"))) === "stra\u00dfe")
    // idempotence
    assert(eval(stripAccents(stripAccents(lit("r\u00e9sum\u00e9")))) === "resume")
    // nulls flow through (nullIntolerant)
    assert(eval(unicodeNfc(lit(null).cast("string"))) === null)
    assert(eval(stripAccents(lit(null).cast("string"))) === null)
  }
}
