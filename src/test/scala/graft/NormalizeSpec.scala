package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Normalize
import graft.sources.Ndjson

class NormalizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val raw = Ndjson.read(spark, TestSpark.fixture("pushshift_fixture.ndjson")).cache()
  lazy val subs = Normalize.submissions(Ndjson.submissionsRaw(raw)).cache()
  lazy val coms = Normalize.comments(Ndjson.commentsRaw(raw)).cache()

  test("S1/S2 discrimination: 4 submissions, 3 comments, 1 corrupt, 1 unknown") {
    assert(Ndjson.submissionsRaw(raw).count() === 4)
    assert(Ndjson.commentsRaw(raw).count() === 3)
    assert(Ndjson.corrupt(raw).count() === 1)
    assert(Ndjson.unclassified(raw).count() === 1)
  }

  test("blank mid-file line is dropped, not EOF (divergence from ingest_jsonfile.py:32-33)") {
    // rows after the blank line are still ingested (comments come after it)
    assert(coms.count() === 3)
  }

  test("P6 url rules (tsdb.py:399-409)") {
    val byId = subs.select("idstr", "url").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(byId("t3_aaa111") === None)                                // selfpost → null
    assert(byId("t3_bbb222") === Some("https://reddit.com/r/test/comments/bbb222")) // relative
    assert(byId("t3_ccc333") === Some("https://reddit.com/r/other/comments/zzz999")) // crosspost
    assert(byId("t3_ddd444") === Some("https://ads.example.com"))
  }

  test("F7 html unescape applied to selftext/body at ingest") {
    val st = subs.filter(col("idstr") === "t3_aaa111").head().getAs[String]("selftext")
    assert(st === "hello & welcome <b> 'quoted'")
    val b = coms.filter(col("idstr") === "t1_eee555").head().getAs[String]("body")
    assert(b === "a comment > quoted")
  }

  test("F16 deleted-author sentinel; promo post null subreddit") {
    val d = subs.filter(col("idstr") === "t3_ddd444").head()
    assert(d.getAs[String]("author") === "[DELETED]")
    assert(d.getAs[String]("subreddit") === null)
    assert(d.getAs[String]("idstr") === "t3_ddd444") // name absent → t3_ + id
  }

  test("parent_id repair (pushshift.py:74-78)") {
    val byId = coms.select("idstr", "parent").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byId("t1_eee555") === "t3_aaa111")
    assert(byId("t1_fff666") === "t1_" + java.lang.Long.toString(888888888L, 36))
    assert(byId("t1_ggg777") === "t3_bbb222")       // null → link_id fallback
  }

  test("F6 textlen computed on unescaped text; idint = b36(id)") {
    val r = subs.filter(col("idstr") === "t3_aaa111").head()
    assert(r.getAs[Long]("textlen") === "hello & welcome <b> 'quoted'".length.toLong)
    assert(r.getAs[Long]("idint") === java.lang.Long.parseLong("aaa111", 36))
  }

  test("_edited carries the edit epoch, null for false (tsdb.py:374-377)") {
    val e = coms.filter(col("idstr") === "t1_fff666").head().getAs[Long]("_edited")
    assert(e === 1371043555L)
    assert(coms.filter(col("idstr") === "t1_eee555").head().isNullAt(
      coms.columns.indexOf("_edited")))
  }

  test("canonical schemas match the store contract (tsdb.py:51-100)") {
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType)).toSeq
    assert(shape(subs.drop("_edited").schema) === shape(graft.model.Schemas.submissions))
    assert(shape(coms.drop("_edited").schema) === shape(graft.model.Schemas.comments))
  }

  test("schema evolution: a v1 archive aligns forward (database_upgrader.py:24-49)") {
    import graft.model.{SchemaEvolution, Schemas}
    // v1: fewer columns, epoch as int, extra legacy column
    val v1 = spark.createDataFrame(Seq(
      (1L, "t1_1", 100, "alice", "t3_r", "t3_r", "hi", 5, "legacy")))
      .toDF("idint", "idstr", "created", "author", "parent", "submission",
        "body", "score", "obsolete_col")
    val up = SchemaEvolution.upgradeComments(v1)
    // shape comparison: alignment keeps tighter nullability where the
    // source column was non-null, which is fine
    assert(up.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      Schemas.comments.fields.map(f => (f.name, f.dataType)).toSeq)
    val row = up.head()
    assert(row.getAs[Long]("created") === 100L)           // int → long cast
    assert(row.isNullAt(up.columns.indexOf("textlen")))   // new col as null
    assert(!up.columns.contains("obsolete_col"))          // legacy pruned
    // idempotent
    assert(SchemaEvolution.upgradeComments(up).collect() === up.collect())
    // the submissions twin follows the same contract (drift guard — it
    // migrates a different target schema, so test it in its own right)
    val v1subs = spark.createDataFrame(Seq(
      (2L, "t3_2", 200, "bob", "a title", "legacy")))
      .toDF("idint", "idstr", "created", "author", "title", "obsolete_col")
    val upS = SchemaEvolution.upgradeSubmissions(v1subs)
    assert(upS.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      Schemas.submissions.fields.map(f => (f.name, f.dataType)).toSeq)
    val rowS = upS.head()
    assert(rowS.getAs[Long]("created") === 200L)
    assert(rowS.isNullAt(upS.columns.indexOf("selftext")))
    assert(!upS.columns.contains("obsolete_col"))
    assert(SchemaEvolution.upgradeSubmissions(upS).collect() === upS.collect())
  }

  test("Tables.registerAll: spark.sql sees every oracle-named table") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    // the SQL surface mirrors the DuckDB oracle naming exactly — a SQL
    // consumer can run oracle-shaped queries verbatim
    val n = spark.sql("SELECT count(*) AS n FROM lineitem").head().getLong(0)
    assert(n > 0)
    val joined = spark.sql(
      """SELECT count(*) AS n FROM orders o JOIN customer c
         ON o.o_custkey = c.c_custkey""").head().getLong(0)
    assert(joined > 0)
    assert(spark.sql("SELECT doc_id FROM documents LIMIT 1").count() === 1)
  }
}
