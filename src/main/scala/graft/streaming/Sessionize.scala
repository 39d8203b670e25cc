package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based session windows, batch and streaming.
  *
  * Batch: the classic lag/cumsum formulation — one window pass per key,
  * one aggregation; SQL-expressible, so oracle-checked (q_sessionize).
  *
  * Streaming: custom per-key state via `flatMapGroupsWithState` with
  * event-time timeout — the Structured Streaming shape for state that
  * windowed aggregation cannot express (a session's end is data-dependent,
  * not clock-aligned). Sessions emit when the watermark passes their gap.
  */
object Sessionize {

  /** Batch sessionization: rows → (key, session_id, start, end, n_events).
    * `session_id` is 1-based per key in time order. */
  def batch(df: DataFrame, key: String, tsSec: Column, gapSec: Long): DataFrame = {
    df.select(col(key).as("k"), tsSec.as("_ts"))
      .withColumn("_new",
        when(col("_ts") - lag(col("_ts"), 1).over(
          Window.partitionBy("k").orderBy("_ts")) > gapSec, 1)
          .when(lag(col("_ts"), 1).over(
            Window.partitionBy("k").orderBy("_ts")).isNull, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("_new")).over(Window.partitionBy("k").orderBy("_ts")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("k").as(key), col("session_id"))
      .agg(min(col("_ts")).as("start"), max(col("_ts")).as("end"),
        count(lit(1)).as("n_events"))
  }

  final case class Ev(user: Long, ts: Timestamp)
  final case class SessionState(start: Long, end: Long, n: Long)
  final case class Session(user: Long, start: Long, end: Long, n_events: Long)

  /** Streaming sessionization. Events must carry a watermarked `ts`; a
    * session closes (emits) when the event-time watermark passes its last
    * event by `gapSec`. In-order delivery within a key is not required —
    * late rows inside the watermark extend/merge naturally because state
    * only tracks (start, end, n) and the gap check uses max(end, ev). */
  def streaming(events: Dataset[Ev], gapSec: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", s"$gapSec seconds")
      .groupByKey(_.user)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, s.start, s.end, s.n))
          } else {
            val sorted = evs.map(_.ts.getTime / 1000).toArray.sorted
            var closed = List.empty[Session]
            var st = state.getOption.orNull
            sorted.foreach { t =>
              st = if (st == null) SessionState(t, t, 1)
              else if (t - st.end > gapSec) {
                closed ::= Session(user, st.start, st.end, st.n)
                SessionState(t, t, 1)
              } else SessionState(st.start, math.max(st.end, t), st.n + 1)
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp(st.end * 1000 + gapSec * 1000)
            }
            closed.reverseIterator
          }
      }
  }
}
