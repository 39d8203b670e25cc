package graft

import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("custom expressions callable from SQL after register()") {
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT html_unescape('a &amp; b')").head().getString(0) === "a & b")
    assert(spark.sql("SELECT markdown_render('**x**')").head().getString(0) ===
      "<p><strong>x</strong></p>")
    assert(spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))").head().getDouble(0) === 11.0)
    assert(spark.sql("SELECT unicode_nfc('cafe\u0301')").head().getString(0) === "caf\u00e9")
    assert(spark.sql("SELECT strip_accents('na\u00efve')").head().getString(0) === "naive")
    assert(spark.sql("SELECT unicode_nfkc('\uff11')").head().getString(0) === "1")
  }

  test("SparkSessionExtensions wiring exposes the same function set") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext) // injection path must not throw
    assert(GraftExtensions.functions.map(_._1).toSet ===
      Set("html_unescape", "markdown_render", "vec_dot", "vec_normalize",
        "simhash64", "word_shingles", "winnow_fingerprints", "minhash_bands",
        "gram_hashes", "unicode_nfc", "unicode_nfkc", "strip_accents"))
  }

  test("array expressions callable from SQL") {
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT vec_normalize(array(3.0d, 4.0d))").head()
      .getSeq[Double](0) === Seq(0.6, 0.8))
    assert(spark.sql("SELECT size(word_shingles(array('a','b','c','b','a','b','c'), 3))")
      .head().getInt(0) === 4)   // abc, bcb, cba, bab — abc repeats
    assert(spark.sql("SELECT simhash64(array('x','y'))").head().getLong(0) !== 0L)
    assert(spark.sql(
      "SELECT size(winnow_fingerprints(array('a','b','c','d','e','f'), 3, 4))")
      .head().getInt(0) >= 1)
    assert(spark.sql("SELECT size(minhash_bands(array('a b', 'b c'), 16, 4))")
      .head().getInt(0) === 4)
    // positional (no dedup): repeated gram keeps both positions
    assert(spark.sql("SELECT size(gram_hashes(array('a','b','a','b'), 2))")
      .head().getInt(0) === 3)
  }

  test("vec_dot arity is validated") {
    GraftExtensions.register(spark)
    intercept[Exception](spark.sql("SELECT vec_dot(array(1.0d))").collect())
  }
}
