package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{HtmlUnescape, MarkdownRender, VectorDot}

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

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("html_unescape", info("html_unescape", "html_unescape(str) - decode HTML entities"),
      unary(HtmlUnescape)),
    ("markdown_render", info("markdown_render", "markdown_render(str) - markdown to HTML5"),
      unary(MarkdownRender)),
    ("vec_dot", info("vec_dot", "vec_dot(a, b) - dot product of two double arrays"),
      es => { require(es.length == 2, "expected 2 arguments"); VectorDot(es(0), es(1)) }))

  /** Register into an existing session (the extensions config path only
    * applies at session build time). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, i, builder) =>
      org.apache.spark.sql.graftshim.ColumnBridge.registerFunction(spark, name, i, builder)
    }
}
