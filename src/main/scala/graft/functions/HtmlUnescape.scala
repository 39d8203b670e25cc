package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for HTML-entity unescape (SURVEY §2.8 F7).
  *
  * A custom `UnaryExpression` with real `doGenCode` (not `CodegenFallback`)
  * so ingest normalization stays inside whole-stage codegen — measurably
  * cheaper than a Scala UDF at 100 TB because rows never leave Tungsten
  * format and the call is a static JVM method on UTF8String.
  */
case class HtmlUnescape(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    HtmlEntities.unescapeUTF8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlEntities.unescapeUTF8($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlUnescape =
    copy(child = newChild)
}
