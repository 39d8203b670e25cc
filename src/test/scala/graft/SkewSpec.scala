package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 90% of rows share one hot key
  private lazy val fact = (1 to 1000).map { i =>
    (if (i <= 900) "hot" else s"k${i % 17}", i.toLong)
  }.toDF("key", "v")
  private lazy val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("key", "label")

  test("saltedJoin is row-identical to the plain join under skew") {
    val plain = fact.join(dim, Seq("key"))
      .select("key", "v", "label").orderBy("key", "v").collect()
    val salted = Skew.saltedJoin(fact, dim, "key", salts = 8, saltSrc = $"v")
      .select("key", "v", "label").orderBy("key", "v").collect()
    assert(salted === plain)
  }

  test("saltedAgg (count) matches the direct aggregation") {
    val direct = fact.groupBy("key").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("key").collect()
    val salted = Skew.saltedAgg(fact, "key", salts = 8, saltSrc = $"v",
        partial = Seq(count(lit(1)).as("n"), sum("v").as("s")),
        combine = Seq(sum("n").as("n"), sum("s").as("s")))
      .orderBy("key").collect()
    assert(salted === direct)
  }
}
