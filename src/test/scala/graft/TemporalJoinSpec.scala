package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalJoin

class TemporalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (key, ts, id) lefts and (key, ts, id, payload) rights covering:
  // latest-at-or-before pick, equal-ts inclusivity, same-ts right tie
  // (max id wins), tolerance exclusion, and no-match-at-all.
  private lazy val lefts = Seq(
    (1L, 100L, 10L), // matches r@90 (latest of 50, 90)
    (1L, 90L, 11L),  // equal-ts: r@90 itself (inclusive)
    (1L, 40L, 12L),  // before any right -> null
    (2L, 500L, 13L), // two rights at ts=500: max id (22) wins
    (3L, 999L, 14L), // only right is 900s earlier -> outside tol=50
    (4L, 10L, 15L)   // key with no rights at all -> null
  ).toDF("k", "t", "id")

  private lazy val rights = Seq(
    (1L, 50L, 20L, "a"),
    (1L, 90L, 21L, "b"),
    (2L, 500L, 22L, "c"),
    (2L, 500L, 19L, "d"),
    (3L, 99L, 23L, "e")
  ).toDF("k", "t", "id", "p")

  private def asofRows(tol: Long) =
    TemporalJoin.asof(lefts, rights, key = "k",
        leftTs = "t", leftId = "id", rightTs = "t", rightId = "id",
        rightPayload = Seq("p"), toleranceSec = tol)
      .select("id", "matched_id", "matched_ts", "p")
      .orderBy("id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) "-" else r.getString(3)))

  test("asof picks latest at-or-before per key; ties on ts go to max right id") {
    assert(asofRows(tol = 1000000L).toSeq === Seq(
      (10L, 21L, 90L, "b"),   // latest of the two candidates
      (11L, 21L, 90L, "b"),   // equal-ts inclusive
      (12L, -1L, -1L, "-"),   // nothing at-or-before
      (13L, 22L, 500L, "c"),  // same-ts rights: id 22 > 19
      (14L, 23L, 99L, "e"),
      (15L, -1L, -1L, "-")))  // key absent from right side
  }

  test("asof tolerance nulls out matches older than the bound (inclusive edge kept)") {
    val rows = asofRows(tol = 50L)
    assert(rows.find(_._1 == 14L).get === ((14L, -1L, -1L, "-"))) // lag 900
    assert(rows.find(_._1 == 10L).get === ((10L, 21L, 90L, "b"))) // lag 10
    // lag exactly == tolerance stays matched
    val edge = asofRows(tol = 10L)
    assert(edge.find(_._1 == 10L).get === ((10L, 21L, 90L, "b")))
    assert(edge.find(_._1 == 11L).get === ((11L, 21L, 90L, "b"))) // lag 0
  }

  test("asof matches a brute-force inequality-join reference on a random corpus") {
    val n = 400
    val l = spark.range(n).select(
      (col("id") % 7).as("k"), (abs(xxhash64(col("id"))) % 1000).as("t"),
      col("id").as("id"))
    val r = spark.range(n).select(
      (col("id") % 7).as("k"),
      (abs(xxhash64(col("id") + 12345)) % 1000).as("t"),
      (col("id") + 10000).as("id"), lit("x").as("p"))
    val got = TemporalJoin.asof(l, r, "k", "t", "id", "t", "id",
        Seq("p"), toleranceSec = 100L)
      .select("id", "matched_id").orderBy("id").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1)))
    val want = l.as("l").join(r.as("r"),
        col("l.k") === col("r.k") && col("r.t") <= col("l.t") &&
          (col("l.t") - col("r.t")) <= 100L, "left")
      .groupBy(col("l.id").as("id"))
      .agg(max(struct(col("r.t"), col("r.id"))).as("best"))
      .select(col("id"), coalesce(col("best.id"), lit(-1L)).as("mid"))
      .orderBy("id").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(got.toSeq === want.toSeq)
  }

  test("asof plan: one hash exchange on the key, no nested-loop join") {
    val df = TemporalJoin.asof(lefts, rights, "k", "t", "id", "t", "id",
      Seq("p"), toleranceSec = 1000L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
    val c = PlanAudit.counters(df)
    assert(c.exchanges === 1, s"expected exactly one hash exchange: $c")
  }

  // range join: intervals spanning multiple buckets must not duplicate
  // pairs; boundaries are inclusive on both ends.
  private lazy val events = Seq(
    (1L, 100L, 1L), (1L, 150L, 2L), (1L, 200L, 3L), (1L, 201L, 4L),
    (2L, 100L, 5L)
  ).toDF("k", "t", "id")

  private lazy val intervals = Seq(
    (1L, 100L, 100L, 200L), // covers ids 1,2,3 (both ends inclusive)
    (1L, 101L, 95L, 400L),  // wide: spans many small buckets, ids 1-4
    (2L, 102L, 150L, 160L), // no events inside
    (2L, 103L, 200L, 100L)  // inverted -> dropped
  ).toDF("k", "iid", "s", "e")

  private def rangeRows(w: Long) =
    TemporalJoin.rangeJoin(events, intervals, key = "k",
        eventId = "id", ts = "t", intervalId = "iid",
        start = "s", end = "e", bucketSec = w)
      .select("iid", "id").orderBy("iid", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))

  test("rangeJoin emits each covered pair exactly once, inclusive bounds") {
    val want = Seq((100L, 1L), (100L, 2L), (100L, 3L),
      (101L, 1L), (101L, 2L), (101L, 3L), (101L, 4L))
    // bucket width smaller than, comparable to, and larger than the
    // interval lengths — identical pairs in every decomposition
    assert(rangeRows(7L).toSeq === want)
    assert(rangeRows(100L).toSeq === want)
    assert(rangeRows(100000L).toSeq === want)
  }

  test("rangeJoin plan is an equi-join: no nested-loop, no cartesian") {
    val df = TemporalJoin.rangeJoin(events, intervals, "k", "id", "t",
      "iid", "s", "e", bucketSec = 50L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
