package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Exact dedup AT INGEST: drop re-arrivals of already-seen content from a
  * stream before it lands — the streaming face of [[Dedup.exact]], for
  * firehoses that replay (re-crawls, backfills, at-least-once sources).
  * Batch dedup then cleans the corpus; this keeps the corpus from growing
  * the duplicates in the first place.
  *
  * Built on `dropDuplicatesWithinWatermark`: state is one entry per
  * DISTINCT surviving key — a content hash, not the document — and the
  * event-time watermark evicts entries once re-arrivals can no longer be
  * late, so state is bounded by (distinct content within the horizon),
  * not by stream lifetime. That bound is the whole 100 TB story: an
  * unwindowed `dropDuplicates` on a firehose grows state forever;
  * choosing the horizon = choosing how stale a replay the pipeline still
  * dedupes (a re-crawl replayed OUTSIDE the horizon re-admits content —
  * by design; the batch dedup family catches it at rest).
  *
  * First-arrival-wins: the emitted row for each distinct content is the
  * one that arrived first — the same canonical-row contract as
  * [[Dedup.exact]]'s min-id, transposed to arrival order (streams have
  * arrival order where batches have ids).
  */
object StreamDedup {

  /** @param stream streaming DataFrame with an event-time column
    * @param text   content column; keyed by md5 of [[Dedup.normText]]
    * @param eventTime event-time column name (TimestampType)
    * @param horizon watermark delay, e.g. "10 minutes" */
  def distinctContent(stream: DataFrame, text: String, eventTime: String,
      horizon: String): DataFrame = {
    // the state key needs a real column; give it a name proven absent
    // from the input so a caller's own columns are never clobbered
    val k = Iterator.iterate("_k")(_ + "_")
      .dropWhile(n => stream.columns.exists(_.equalsIgnoreCase(n))).next()
    stream
      .withColumn(k, md5(Dedup.normText(col(text))))
      .withWatermark(eventTime, horizon)
      .dropDuplicatesWithinWatermark(k)
      .drop(k)
  }
}
