package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Search

class SearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("BM25: rarer matching term outranks a common one; scores positive") {
    // 'needle' appears once; 'filler' is in every doc — the needle doc
    // must win a query containing both despite equal tf
    val docs = corpus(
      1L -> "filler needle word word",
      2L -> "filler word word word",
      3L -> "filler word word word",
      4L -> "filler word word word")
    val hits = Search.bm25TopK(docs, "doc_id", "text",
        queries = Seq(0L -> "needle filler"), k = 4)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("score_bp")))
    assert(hits.head._2 === 1L, s"needle doc must rank first: ${hits.toSeq}")
    assert(hits.forall(_._3 > 0L))
    assert(hits.map(_._1).toSeq === (1 to 4))
  }

  test("BM25: identical documents tie exactly and break on doc_id; k caps rows") {
    val docs = corpus(
      10L -> "alpha beta gamma",
      7L  -> "alpha beta gamma",
      3L  -> "unrelated words here")
    val hits = Search.bm25TopK(docs, "doc_id", "text",
        queries = Seq(0L -> "alpha"), k = 1)
      .collect()
    // integer scores → the duplicate docs tie EXACTLY; doc 7 wins the tie
    assert(hits.length === 1 && hits.head.getAs[Long]("doc_id") === 7L)
    val both = Search.bm25TopK(docs, "doc_id", "text",
        queries = Seq(0L -> "alpha"), k = 5).collect()
    assert(both.map(_.getAs[Long]("doc_id")).toSeq === Seq(7L, 10L))
    assert(both.map(_.getAs[Long]("score_bp")).distinct.length === 1,
      "identical docs must score identically")
  }

  test("BM25: absent query terms contribute nothing; all-absent query returns no rows") {
    val docs = corpus(1L -> "alpha beta", 2L -> "alpha alpha beta")
    val withGhost = Search.bm25TopK(docs, "doc_id", "text",
      queries = Seq(0L -> "alpha zzzghost"), k = 5).collect()
    val without = Search.bm25TopK(docs, "doc_id", "text",
      queries = Seq(0L -> "alpha"), k = 5).collect()
    assert(withGhost.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_bp"))).toSeq
      === without.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_bp"))).toSeq)
    val none = Search.bm25TopK(docs, "doc_id", "text",
      queries = Seq(0L -> "zzzghost"), k = 5).collect()
    assert(none.isEmpty)
  }

  test("BM25 term-SET semantics hold across repeated query_id entries") {
    val docs = corpus(1L -> "alpha beta", 2L -> "alpha alpha beta")
    // one query split over two entries, sharing 'alpha' — must score
    // identically to the single-entry spelling (no double-counting)
    val split = Search.bm25TopK(docs, "doc_id", "text",
      queries = Seq(0L -> "alpha", 0L -> "alpha beta"), k = 5).collect()
    val whole = Search.bm25TopK(docs, "doc_id", "text",
      queries = Seq(0L -> "alpha beta"), k = 5).collect()
    def key(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_bp"))).toSeq
    assert(key(split) === key(whole))
  }

  test("BM25 plan: query-term postings filter is a broadcast join (corpus never shuffles for it)") {
    val docs = corpus((1L to 50L).map(i => i -> s"tok$i alpha common"): _*)
    val plan = Search.bm25TopK(docs, "doc_id", "text",
        queries = Seq(0L -> "alpha"), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"query terms must broadcast against the postings:\n$plan")
  }
}
