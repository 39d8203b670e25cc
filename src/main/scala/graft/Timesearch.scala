package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.operators.{Analytics, Merge, Normalize}
import graft.render.OfflineReading
import graft.sources.{Ndjson, Sinks}
import graft.streaming.Livestream

/** The reference's command surface (timesearch.py:22-60 module dispatch),
  * verb-for-verb, over a [[Archive]] (the versioned submission+comment
  * store standing in for one per-target SQLite file). A timesearch user
  * maps their workflow directly:
  *
  * {{{
  * val a = Timesearch.openArchive(spark, "/data/archives/r_scala")
  * Timesearch.ingestJsonFile(spark, a, "dump.ndjson")     // ingest_jsonfile
  * Timesearch.breakdown(a, sort = "total")                // breakdown -r
  * Timesearch.index(a, threshold = 100, sort = "score")   // index --score
  * Timesearch.offlineReading(a, "out/html")               // offline_reading
  * Timesearch.mergeDb(spark, a, other)                    // merge_db
  * Timesearch.livestream(stream, a, "ckp")                // livestream
  * }}}
  *
  * `get_submissions`/`get_comments` (API ingest) reduce to
  * [[ingestFrames]] + [[incrementalLowerBound]] once rows are fetched —
  * the HTTP layer is out of engine scope (SURVEY §2.1 S4); `get_styles`
  * and `get_wiki` are [[Sinks]] writes of fetched payloads.
  */
object Timesearch {

  /** One archive target = two versioned upsert tables sharing a root.
    * `keyBuckets` records the layout the archive was opened with so
    * per-key access paths ([[openSubmissionArchive]]) can prune.
    *
    * Verb ↔ reference-module map (timesearch.py:22-60 dispatch table):
    *  - `timesearch` / `get_submissions`+`get_comments` (timesearch.py:37-44,
    *    HTTP fetch excluded per SURVEY §2.1 S4) → [[ingestFrames]] +
    *    [[incrementalLowerBound]]
    *  - `ingest_jsonfile` (ingest_jsonfile.py) → [[ingestJsonFile]]
    *  - `breakdown` (breakdown.py) → [[breakdown]]
    *  - `index` (index.py) → [[index]]
    *  - `offline_reading` (offline_reading.py) → [[offlineReading]]
    *  - `merge_db` (merge_db.py) → [[mergeDb]]
    *  - `livestream` (livestream.py) → [[livestream]]
    *  - `get_styles` / `get_wiki` (get_styles.py, get_wiki.py; fetch
    *    excluded) → [[writePages]]
    *  - per-submission working copy (tsdb.py:268-274 `for_submission`) →
    *    [[openSubmissionArchive]] */
  final case class Archive(
      submissions: Livestream.UpsertTable,
      comments: Livestream.UpsertTable,
      keyBuckets: Option[Int] = None)

  /** @param keyBuckets Some(n) = key-bucket-partitioned tables (the scale
    *        layout: a merge rewrites only the buckets a batch touches —
    *        see [[Livestream.UpsertTable]]); None = legacy flat layout.
    *        The choice is pinned at first publish and validated on every
    *        reopen, so pass the same value for the archive's lifetime. */
  def openArchive(spark: SparkSession, root: String,
      outputPartitions: Option[Int] = None,
      keyBuckets: Option[Int] = None): Archive = {
    def empty(s: org.apache.spark.sql.types.StructType) =
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
    val pt = keyBuckets.map(b => Livestream.keyBucket(nBuckets = b))
    Archive(
      new Livestream.UpsertTable(spark, s"$root/submissions", Merge.submissions,
        empty(model.Schemas.submissions), outputPartitions, pt),
      new Livestream.UpsertTable(spark, s"$root/comments", Merge.comments,
        empty(model.Schemas.comments), outputPartitions, pt),
      keyBuckets)
  }

  /** One submission thread's slice of an archive: the submission row and
    * its comments. */
  final case class SubmissionArchive(submission: DataFrame, comments: DataFrame)

  /** `TSDB.for_submission` (tsdb.py:268-274): the per-thread archive.
    * The reference creates a separate SQLite FILE per submission; over
    * the shared versioned store the analog is a pruned VIEW. On a
    * keyBucket layout the submission lookup computes the key's bucket
    * driver-side (same expression family as [[Livestream.keyBucket]])
    * and reads ONLY that partition's files — the open-one-small-file
    * access path. The comment side filters on `submission`; comments are
    * bucketed by their own key, so that side is a scan-filter by design
    * (the reference pays a full table copy to build the file instead). */
  def openSubmissionArchive(spark: SparkSession, archive: Archive,
      submissionIdstr: String): SubmissionArchive = {
    import org.apache.spark.sql.functions.col
    val sub = archive.keyBuckets match {
      case Some(n) =>
        // driver-side Catalyst eval of the key's bucket — no Spark job on
        // the path whose whole purpose is to be cheap
        val pt = Livestream.keyBucketValue(submissionIdstr, n).toString
        archive.submissions.partition(pt).filter(col("idstr") === submissionIdstr)
      case None =>
        archive.submissions.current.filter(col("idstr") === submissionIdstr)
    }
    SubmissionArchive(sub,
      archive.comments.current.filter(col("submission") === submissionIdstr))
  }

  /** ingest_jsonfile: NDJSON dump → discriminate → normalize → upsert.
    * A dump that contains the same id twice (a re-crawl appended to an
    * archive dump) resolves exactly as the reference's sequential replay
    * does — last occurrence in file order wins, and the edit-CDC sees
    * every intermediate version (tsdb.py:389-461): `_seq` is derived from
    * scan-time file order ([[Ndjson.fileOrderSeq]]), so the outcome is
    * identical under ANY physical split plan. */
  def ingestJsonFile(spark: SparkSession, archive: Archive, path: String): Unit = {
    val raw = Ndjson.readOrdered(spark, path)
    ingestFrames(archive,
      Normalize.submissions(Ndjson.fileOrderSeq(Ndjson.submissionsRaw(raw))),
      Normalize.comments(Ndjson.fileOrderSeq(Ndjson.commentsRaw(raw))))
  }

  /** Merge normalized frames into the archive (the shared tail of
    * ingest_jsonfile / get_submissions / get_comments).
    *
    * ==Within-batch precedence==
    * A frame carrying a `_seq` column keeps it as the within-batch
    * precedence (the deterministic path — [[ingestJsonFile]] provides
    * file order). A frame WITHOUT `_seq` falls back to
    * `monotonically_increasing_id()`, which follows input order per
    * partition but ranks rows of DIFFERENT partitions by partition index:
    * if the same key appears in two partitions, which occurrence wins
    * depends on the physical split plan (same caveat as
    * [[Livestream.upsertSink]]'s `_seq` contract). Callers replaying
    * ordered history with duplicate keys should supply `_seq`. */
  def ingestFrames(archive: Archive, submissions: DataFrame, comments: DataFrame): Unit = {
    import org.apache.spark.sql.functions.monotonically_increasing_id
    def seqd(df: DataFrame): DataFrame =
      if (df.columns.contains("_seq")) df
      else df.withColumn("_seq", monotonically_increasing_id())
    archive.submissions.merge(seqd(submissions), "_seq")
    archive.comments.merge(seqd(comments), "_seq")
  }

  /** get_submissions/get_comments `lower='update'` bound (A3). */
  def incrementalLowerBound(archive: Archive): DataFrame =
    Analytics.incrementalBound(archive.submissions.current
      .select("created")
      .unionByName(archive.comments.current.select("created")))

  /** breakdown: per-author counts (subreddit archives). */
  def breakdown(archive: Archive, sort: String = "name"): DataFrame =
    Analytics.breakdownSorted(
      Analytics.breakdown(archive.submissions.current, archive.comments.current,
        "author"), sort)

  /** index: threshold-filtered sorted listing of submissions. */
  def index(archive: Archive, threshold: Long, sort: String): DataFrame =
    Analytics.indexListing(archive.submissions.current, threshold, sort)

  /** offline_reading: every thread rendered to one HTML file. */
  def offlineReading(archive: Archive, outDir: String): Unit =
    OfflineReading.writeHtmlFiles(
      OfflineReading.fromFrames(archive.submissions.current,
        archive.comments.current), outDir)

  /** merge_db: copy rows absent from this archive (never update). */
  def mergeDb(spark: SparkSession, mine: Archive, other: Archive): Unit = {
    import org.apache.spark.sql.functions.lit
    mine.submissions.merge(
      Merge.mergeDb(mine.submissions.current, other.submissions.current)
        .withColumn("_seq", lit(0L)), "_seq", storeEdits = Some(false))
    mine.comments.merge(
      Merge.mergeDb(mine.comments.current, other.comments.current)
        .withColumn("_seq", lit(0L)), "_seq", storeEdits = Some(false))
  }

  /** livestream: a comment-shaped stream upserted every trigger. */
  def livestream(stream: DataFrame, archive: Archive, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds")): DataStreamWriter[org.apache.spark.sql.Row] =
    Livestream.upsertSink(stream, archive.comments, checkpoint, trigger)

  /** get_wiki / get_styles: fetched payloads → per-key file sinks. */
  def writePages(pages: org.apache.spark.sql.Dataset[(String, String)],
      outDir: String, ext: String): Unit =
    Sinks.writeFilesPerRow(pages, outDir, ext)
}
