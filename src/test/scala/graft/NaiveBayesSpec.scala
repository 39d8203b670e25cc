package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.NaiveBayes

class NaiveBayesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "ham ham eggs", "a"), (2L, "ham toast", "a"),
    (3L, "spam spam link", "b"), (4L, "spam win link", "b"),
    (5L, "ham eggs toast", "a")
  ).toDF("doc_id", "text", "lbl")

  test("separable classes classify perfectly; confusion is diagonal") {
    val conf = NaiveBayes.confusion(docs, "doc_id", "text", "lbl")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(conf === Map(("a", "a") -> 3L, ("b", "b") -> 2L))
  }

  test("scores match a direct replay of the quantized-ln formula") {
    def lnbp(x: Long) = math.floor(math.log(x.toDouble) * 10000).toLong
    val got = NaiveBayes.classify(docs, "doc_id", "text", "lbl")
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getLong(3)))
      .toMap
    // doc 2 = "ham toast", class a counts: ham 4 (2+1+1), eggs 2,
    // toast 2 -> tot_a = 8; V = 6 (ham eggs toast spam link win);
    // prior_a = lnbp(3) - lnbp(5);
    // score(2,a) = prior + lnbp(4+1) + lnbp(2+1) - 2*lnbp(8+6)
    val expA = (lnbp(3) - lnbp(5)) + lnbp(5) + lnbp(3) - 2 * lnbp(14)
    assert(got(2L)._1 === "a")
    assert(got(2L)._2 === expA)
    // class b never saw ham/toast: score(2,b) = prior_b - 2*lnbp(tot_b+V)
    // = (lnbp(2)-lnbp(5)) - 2*lnbp(6+6); a must beat it
    val expB = (lnbp(2) - lnbp(5)) - 2 * lnbp(12)
    assert(expA > expB)
  }

  test("empty-text docs and ties behave deterministically") {
    // a doc with no tokens gets score = prior per class -> the most
    // frequent class wins; exact prior ties break lexicographically
    val d2 = docs.union(Seq((9L, "...", "b")).toDF("doc_id", "text", "lbl"))
    val got = NaiveBayes.classify(d2, "doc_id", "text", "lbl")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // doc 9 has no postings row at all -> absent (no token evidence);
    // the operator classifies TOKENIZED docs (postings-driven)
    assert(!got.contains(9L))
  }
}
