package graft

import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("custom expressions callable from SQL after register()") {
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT html_unescape('a &amp; b')").head.getString(0) === "a & b")
    assert(spark.sql("SELECT markdown_render('**x**')").head.getString(0) ===
      "<p><strong>x</strong></p>")
    assert(spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))").head.getDouble(0) === 11.0)
  }

  test("SparkSessionExtensions wiring exposes the same function set") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext) // injection path must not throw
    assert(GraftExtensions.functions.map(_._1).toSet ===
      Set("html_unescape", "markdown_render", "vec_dot"))
  }

  test("vec_dot arity is validated") {
    GraftExtensions.register(spark)
    intercept[Exception](spark.sql("SELECT vec_dot(array(1.0d))").collect())
  }
}
