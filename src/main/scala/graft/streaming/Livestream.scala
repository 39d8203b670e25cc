package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.operators.Merge

/** Livestream analog (SURVEY §2.1 S6, §2.9 T1-T8; livestream.py:45-196).
  *
  * The reference polls /new every 30 s and upserts each ≤100-row batch into
  * SQLite. Spark-first re-expression: any streaming source → micro-batches
  * → `foreachBatch` running the SAME batch merge as offline ingest
  * (graft.operators.Merge) into a versioned parquet table. Identical code
  * path for batch and streaming writes is what makes replay idempotent
  * (T3: unbounded lateness, duplicate batches collapse in the merge).
  */
object Livestream {

  /** Parquet-backed upsert target with atomic version swap.
    *
    * Layout: `path/v=N/` table versions (readers pick max N via a pointer
    * file written last), `path/edits/` append-only CDC log. A Delta/Iceberg
    * table would subsume this; the contract here is engine-agnostic and
    * filesystem-atomic (pointer rename). One SQLite file per target in the
    * reference ↔ one table directory per target here. Single-writer per
    * table (the reference's one-process contract); readers are lock-free.
    *
    * @param outputPartitions cap on files per published version — for
    *        SMALL targets (a single subreddit's table) where the default
    *        shuffle parallelism would write hundreds of tiny files; leave
    *        None at scale and let the shuffle partitioning flow through. */
  final class UpsertTable(spark: SparkSession, path: String, entity: Merge.Entity,
      emptyLike: DataFrame, outputPartitions: Option[Int] = None) {
    private val ptr = Paths.get(path, "_VERSION")

    def currentVersion: Long =
      if (Files.exists(ptr)) new String(Files.readAllBytes(ptr)).trim.toLong else -1L

    def current: DataFrame = at(currentVersion)

    /** Time travel: read a specific published version (−1 or a vacuumed
      * version yields the empty frame). */
    def at(version: Long): DataFrame =
      if (version < 0 || !Files.exists(Paths.get(path, s"v=$version")))
        emptyLike.limit(0)
      else spark.read.parquet(s"$path/v=$version")

    private def emptyEdits: DataFrame = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      graft.model.Schemas.edits(entity.editTextCol))

    /** The CDC log up to the CURRENT version — edit batches staged under a
      * not-yet-published version are invisible until the pointer moves. */
    def edits: DataFrame = {
      val d = Paths.get(path, "edits")
      val hasFiles = Files.exists(d) && {
        val s = Files.list(d)
        try s.findFirst().isPresent finally s.close()
      }
      if (!hasFiles) emptyEdits
      else spark.read.parquet(s"$path/edits")
        .filter(col("ev") <= currentVersion)
        .drop("ev")
    }

    /** Drop table versions older than the `keep` most recent published
      * ones (each merge rewrites the FULL table, so old versions are pure
      * storage overhead). The CDC log is history and is never vacuumed —
      * the reference's edits tables are permanent (tsdb.py:88-99). */
    def vacuum(keep: Int = 2): Unit = {
      require(keep >= 1)
      val cur = currentVersion
      if (cur < 0) return
      val cutoff = cur - (keep - 1)
      val s = Files.list(Paths.get(path))
      val doomed = try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(_.getFileName.toString.startsWith("v="))
          .filter(_.getFileName.toString.drop(2).toLong < cutoff)
          .toList
      } finally s.close()
      doomed.foreach { d =>
        val files = Files.walk(d)
        try files.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.delete(p))
        finally files.close()
      }
    }

    /** Merge one batch and atomically publish the next version.
      *
      * Retry-idempotent (T3): the table overwrites `v=N+1` and the edit
      * batch overwrites `edits/ev=N+1`; both only become visible when the
      * version pointer moves, which happens last — a foreachBatch replay
      * after a mid-merge crash rewrites the same staging dirs instead of
      * appending duplicate CDC rows. */
    def merge(batch: DataFrame, seqCol: String, storeEdits: Boolean = true): Unit = {
      val next = currentVersion + 1
      val r = Merge.upsert(current, batch, entity, seqCol, storeEdits = storeEdits)
      val out = outputPartitions.map(r.table.coalesce).getOrElse(r.table)
      out.write.mode("overwrite").parquet(s"$path/v=$next")
      if (storeEdits)
        r.edits.write.mode("overwrite").parquet(s"$path/edits/ev=$next")
      val tmp = Paths.get(path, "_VERSION.tmp")
      Files.write(tmp, next.toString.getBytes)
      Files.move(tmp, ptr, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Wire a streaming DataFrame into the upsert table. Each micro-batch
    * gets a monotone `_seq` from (batchId, input order) so within-batch
    * precedence survives (dummy-then-live, pushshift.py:224-243).
    *
    * Trigger choices mirror the reference CLI: `ProcessingTime("30 seconds")`
    * ↔ `--wait 30`, `AvailableNow` ↔ `--once` (timesearch.py:257-264).
    */
  def upsertSink(stream: DataFrame, table: UpsertTable,
      checkpoint: String, trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[org.apache.spark.sql.Row] =
    stream
      // A4 per-batch counters (tsdb.py:335-358 new_submissions/new_comments
      // tallies): observe() rides the existing scan — no extra job — and
      // surfaces in StreamingQueryProgress.observedMetrics("graft_batch").
      .observe("graft_batch",
        count(lit(1)).as("rows"),
        approx_count_distinct(col("idstr")).as("distinct_ids"))
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // persist: the merge materializes the batch twice (table write +
        // CDC write) — caching scans the source once per trigger, and
        // keeps the observed metrics counted once (a micro-batch is
        // bounded by the trigger cap, so the cache is small by contract)
        val seqd = batch.withColumn("_seq",
          lit(batchId) * 1000000000L + monotonically_increasing_id()).persist()
        try table.merge(seqd, "_seq") finally seqd.unpersist()
      }

  /** T2/T6 rate shaping: newest ≤limit rows per cycle per target — on a
    * file/queue source this is `maxFilesPerTrigger`/`maxOffsetsPerTrigger`;
    * provided here as a helper for sources that lack the option. */
  def capBatch(batch: DataFrame, orderCol: String, limit: Int): DataFrame =
    batch.orderBy(col(orderCol).desc).limit(limit)

  /** T7 round-robin over targets = union of per-target streams; Spark's
    * scheduler interleaves micro-batches fairly. */
  def unionTargets(streams: Seq[DataFrame]): DataFrame =
    streams.reduce(_.unionByName(_, allowMissingColumns = true))
}
