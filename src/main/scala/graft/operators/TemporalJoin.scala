package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins the built-in operators don't express directly: the
  * as-of join (each left row ⟵ the latest right row at-or-before its
  * timestamp, per key) and the bounded range/interval join (events ⟵
  * every interval that covers them, per key).
  *
  * Both re-expressions are chosen for the 100 TB shape, not convenience:
  *
  *  - `asof` is the union-merge form: tag both sides, ONE hash exchange
  *    on the key, one per-key time sort, and a carry-forward
  *    `last_value(ignoreNulls)` window picks each left row's match. No
  *    inequality join ever appears in the plan — an inequality join
  *    over two corpus-sized sides would plan as a broadcast-nested-loop
  *    (or range-partitioned NL at best) and dominate the job. The
  *    shuffled volume is exactly |left| + |right| rows, once.
  *
  *  - `rangeJoin` decomposes intervals into fixed-width time buckets
  *    (`sequence(floor(start/W), floor(end/W))`) so the pair generation
  *    is a plain equi-join on (key, bucket) with the BETWEEN residual
  *    applied post-join. Each matching pair is emitted exactly once —
  *    the event's own bucket is the only covered bucket that equals it,
  *    so no dedup pass is needed. Fan-out is bounded by
  *    len(interval)/W + 1 copies of the interval side only; W should be
  *    sized to the median interval length (fan-out ≈ 2).
  *
  * Reference behavior being generalized: timesearch's "get newest
  * before cursor" incremental scans (timesearch/common.py cursor
  * bounds) are point as-of lookups; these operators are the set-at-once
  * distributed forms.
  */
object TemporalJoin {

  /** For each left row, the right row with the greatest `rightTs` such
    * that `rightTs <= leftTs` and `leftTs - rightTs <= toleranceSec`,
    * matched within `key`. Ties on `rightTs` resolve to the greatest
    * `rightId` (deterministic). Unmatched / out-of-tolerance left rows
    * keep null match columns (left-outer semantics).
    *
    * Inputs carry integer-second timestamps (the engine's `tsSec`
    * convention). `rightPayload` columns ride along on the matched row
    * as a single struct (`last_value` of one non-null struct per right
    * row — per-column carry could otherwise mix rows if a payload
    * column were legitimately null).
    *
    * Output: left key/ts/id columns + `matched_id`, `matched_ts`, and
    * the payload columns, all null when unmatched.
    *
    * Scale: one hash exchange on `key`, one sort. A pathologically hot
    * key serializes its own window sort; the mitigation (range-split
    * the key's timeline and carry the last pre-boundary right row into
    * each split) is documented in SCALE.md rather than built, because
    * AQE already splits the *exchange* and the sort is O(n log n) in
    * the hot key's rows only.
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, leftId: String,
           rightTs: String, rightId: String,
           rightPayload: Seq[String],
           toleranceSec: Long): DataFrame = {
    require(toleranceSec >= 0, s"toleranceSec must be >= 0: $toleranceSec")
    val payloadStruct = struct(
      (Seq(col(rightTs).as("_mts"), col(rightId).as("_mid")) ++
        rightPayload.map(c => col(c).as(c))): _*)
    val leftIdType = left.schema(leftId).dataType
    val r = right.select(col(key).as("_k"), col(rightTs).as("_t"),
      lit(0).as("_side"), col(rightId).cast("long").as("_tie"),
      payloadStruct.as("_m"), lit(null).cast(leftIdType).as("_lid"))
    val l = left.select(col(key).as("_k"), col(leftTs).as("_t"),
      lit(1).as("_side"), lit(0L).as("_tie"),
      lit(null).cast(r.schema("_m").dataType).as("_m"),
      col(leftId).as("_lid"))
    // Right rows sort before left rows at equal ts (inclusive at-or-
    // before); among equal-ts right rows the greatest _tie lands last,
    // so carry-forward picks it.
    val w = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = r.unionByName(l)
      .withColumn("_last", last(col("_m"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val inTol = col("_last").isNotNull &&
      (col("_t") - col("_last._mts")) <= lit(toleranceSec)
    matched.select((Seq(
      col("_lid").as(leftId), col("_k").as(key), col("_t").as(leftTs),
      when(inTol, col("_last._mid")).as("matched_id"),
      when(inTol, col("_last._mts")).as("matched_ts")) ++
      rightPayload.map(c => when(inTol, col(s"_last.$c")).as(c))): _*)
  }

  /** Every (interval, event) pair with `start <= ts <= end` (inclusive
    * both ends), matched within `key`, via `bucketSec`-wide time-bucket
    * decomposition. `intervals` carries (`key`, `intervalId`, `start`,
    * `end`) with integer-second bounds; `events` carries (`key`,
    * `eventId`, `ts`).
    *
    * Output: intervalId, eventId, key, ts, start, end — one row per
    * matching pair, exactly once.
    */
  def rangeJoin(events: DataFrame, intervals: DataFrame, key: String,
                eventId: String, ts: String,
                intervalId: String, start: String, end: String,
                bucketSec: Long): DataFrame = {
    require(bucketSec > 0, s"bucketSec must be > 0: $bucketSec")
    val iv = intervals.filter(col(start) <= col(end)).select(
      col(key).as("_k"), col(intervalId), col(start), col(end),
      explode(sequence(floor(col(start) / bucketSec).cast("long"),
        floor(col(end) / bucketSec).cast("long"))).as("_b"))
    val ev = events.select(col(key).as("_k"), col(eventId), col(ts),
      floor(col(ts) / bucketSec).cast("long").as("_b"))
    iv.join(ev, Seq("_k", "_b"))
      .filter(col(ts) >= col(start) && col(ts) <= col(end))
      .select(col(intervalId), col(eventId), col("_k").as(key),
        col(ts), col(start), col(end))
  }
}
