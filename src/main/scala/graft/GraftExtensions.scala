package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.IntegerType

import graft.functions.{GramHashes, HtmlUnescape, MarkdownRender, MinHashBands,
  SimHash64, StripAccents, UnicodeNfc, UnicodeNfkc, VectorDot, VectorNormalize,
  WinnowFingerprints, WordShingles}

/** Engine extension point: registers the custom Catalyst expressions as
  * SQL functions so `spark.sql` and the DataFrame API can call them by
  * name on any session of the cluster.
  *
  * Two wiring paths:
  *  - cluster config: `spark.sql.extensions=graft.GraftExtensions`
  *    (applied at session build — the standard deployment);
  *  - [[GraftExtensions.register]] for an already-built session (tests,
  *    notebooks).
  *
  * No custom `Rule[LogicalPlan]` or `SparkStrategy` is injected by
  * design: SURVEY §4 — every physical shape the reference needs is
  * already chosen well by Catalyst + AQE; the engine extends Spark only
  * where expressions are genuinely missing.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.0.0", "", "scala_udf")

  private def unary(f: Expression => Expression): Seq[Expression] => Expression =
    es => { require(es.length == 1, "expected 1 argument"); f(es.head) }

  /** Extract a literal int argument (e.g. shingle width in SQL calls). */
  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("html_unescape", info("html_unescape", "html_unescape(str) - decode HTML entities"),
      unary(HtmlUnescape)),
    ("markdown_render", info("markdown_render", "markdown_render(str) - markdown to HTML5"),
      unary(MarkdownRender)),
    ("vec_dot", info("vec_dot", "vec_dot(a, b) - dot product of two double arrays"),
      es => { require(es.length == 2, "expected 2 arguments"); VectorDot(es(0), es(1)) }),
    ("vec_normalize", info("vec_normalize",
      "vec_normalize(a) - unit-normalize a double array; NULL for zero vectors"),
      unary(VectorNormalize)),
    ("simhash64", info("simhash64", "simhash64(words) - 64-bit SimHash of a word array"),
      unary(SimHash64)),
    ("word_shingles", info("word_shingles",
      "word_shingles(words, n) - distinct word n-gram shingle set"),
      es => { require(es.length == 2, "expected 2 arguments")
        WordShingles(es(0), litInt(es(1), "shingle width")) }),
    ("winnow_fingerprints", info("winnow_fingerprints",
      "winnow_fingerprints(words, k, w) - winnowing fingerprint selection"),
      es => { require(es.length == 3, "expected 3 arguments")
        WinnowFingerprints(es(0), litInt(es(1), "k"), litInt(es(2), "w")) }),
    ("gram_hashes", info("gram_hashes",
      "gram_hashes(words, k) - position-ordered k-gram hashes (no dedup)"),
      es => { require(es.length == 2, "expected 2 arguments")
        GramHashes(es(0), litInt(es(1), "k")) }),
    ("minhash_bands", info("minhash_bands",
      "minhash_bands(shingles, numHashes, bands) - MinHash-LSH band buckets"),
      es => { require(es.length == 3, "expected 3 arguments")
        MinHashBands(es(0), litInt(es(1), "numHashes"), litInt(es(2), "bands")) }),
    ("unicode_nfc", info("unicode_nfc",
      "unicode_nfc(str) - NFC canonical composition (ASCII fast path)"),
      unary(UnicodeNfc)),
    ("unicode_nfkc", info("unicode_nfkc",
      "unicode_nfkc(str) - NFKC compatibility folding"),
      unary(UnicodeNfkc)),
    ("strip_accents", info("strip_accents",
      "strip_accents(str) - NFD, drop combining marks, NFC recompose"),
      unary(StripAccents)))
  // SrpSignature / NearestCentroids are intentionally NOT SQL-registered:
  // their hyperplane/codebook matrices are plan-time Scala values with no
  // SQL literal form — the Scala column API is their surface.

  /** Register into an existing session (the extensions config path only
    * applies at session build time). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, i, builder) =>
      org.apache.spark.sql.graftshim.ColumnBridge.registerFunction(spark, name, i, builder)
    }
}
