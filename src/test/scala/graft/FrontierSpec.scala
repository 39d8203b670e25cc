package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Analytics, Events}

/** r10 analytics devices: 2D skyline and sweep-line concurrency. */
class FrontierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naiveSkyline(pts: Seq[(Long, Long, Long)]): Set[Long] =
    pts.filter { case (_, xa, ya) =>
      !pts.exists { case (_, xb, yb) =>
        xb <= xa && yb >= ya && (xb < xa || yb > ya)
      }
    }.map(_._1).toSet

  test("skyline2d == naive dominance filter on random corpora (with ties)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      // small value ranges force duplicate points and equal-x/equal-y ties
      val pts = (1L to 200L).map(i =>
        (i, rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      val got = Analytics.skyline2d(
          pts.toDF("k", "xx", "yy"), "k", col("xx"), col("yy"), buckets = 7)
        .select("k").as[Long].collect().toSet
      assert(got === naiveSkyline(pts), s"trial $trial")
    }
  }

  test("skyline2d keeps all copies of duplicated frontier points") {
    val pts = Seq((1L, 5L, 5L), (2L, 5L, 5L), (3L, 9L, 9L), (4L, 9L, 1L))
    val got = Analytics.skyline2d(pts.toDF("k", "xx", "yy"), "k",
      col("xx"), col("yy")).select("k").as[Long].collect().toSet
    // (9,9) dominates nothing at (5,5)? x is minimized: 5<9 so (5,5) not
    // dominated by (3); (3) has bigger y but worse x -> both survive; (4)
    // is dominated by (3) (same x, smaller y).
    assert(got === Set(1L, 2L, 3L))
  }

  test("concurrency: hand-computed profile incl. net-zero boundary merge") {
    // [0,9], [5,14], [15,24]: end+1 of the 2nd == start of the 3rd (t=15)
    // is a net-zero second and must NOT split the level-1 segment.
    val iv = Seq((0L, 9L), (5L, 14L), (15L, 24L)).toDF("start", "end")
    val got = Events.concurrency(iv, "start", "end")
      .as[(Long, Long)].collect().toMap
    // levels: t∈[0,5)=1, [5,10)=2, [10,15)=1, [15,25)=1 -> 1:5+5+10=20, 2:5
    assert(got === Map(1L -> 20L, 2L -> 5L))
  }

  test("changepoints: the |S| argmax lands on a planted level shift") {
    // 20 days at ~5 events/day then 20 days at ~15: the walk's extremum
    // must land on the boundary day (k=20, day index 19·86400)
    val evs = (0 until 40).flatMap { d =>
      val n = if (d < 20) 5 else 15
      (0 until n).map(i => (d.toLong * 86400 + i * 60, 1L))
    }.toDF("sec", "one")
    val top = Events.changepoints(evs, col("sec"), k = 1)
      .select("day").as[Long].head()
    assert(top === 19L * 86400)
  }

  test("concurrency: disjoint intervals never report level 0 gaps") {
    val iv = Seq((0L, 1L), (100L, 101L)).toDF("start", "end")
    val got = Events.concurrency(iv, "start", "end")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 4L))
  }
}
