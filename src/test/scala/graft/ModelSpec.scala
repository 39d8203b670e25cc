package graft

import org.apache.spark.sql.catalyst.ScalaReflection
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Comment, CommentEdit, Models, Schemas, Submission}

class ModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def shape(s: StructType) = s.fields.map(f => (f.name, f.dataType)).toSeq

  test("typed models mirror the canonical schemas field-for-field") {
    def of[T: scala.reflect.runtime.universe.TypeTag] =
      ScalaReflection.schemaFor[T].dataType.asInstanceOf[StructType]
    assert(shape(of[Submission]) === shape(Schemas.submissions))
    assert(shape(of[Comment]) === shape(Schemas.comments))
    assert(shape(of[CommentEdit]) === shape(Schemas.commentEdits))
  }

  test("typed round-trip through a canonical frame") {
    import spark.implicits._
    val c = Comment(1L, "t1_1", 100L, "alice", Some("t3_r"), Some("t3_r"),
      "hi", 5L, Some("test"), None, 2L)
    val ds = Models.comments(Seq(c).toDS().toDF())
    assert(ds.head() === c)
  }
}
