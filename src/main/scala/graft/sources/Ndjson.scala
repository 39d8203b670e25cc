package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** NDJSON archive-dump source (SURVEY §2.1 S1/S2; ingest_jsonfile.py:12-40).
  *
  * Differences from the reference, by design (SURVEY §7.4.6):
  *  - schema-on-read with a pinned StructType (never inference — one pass,
  *    stable types at 100 TB);
  *  - PERMISSIVE mode quarantines malformed lines into `_corrupt_record`
  *    instead of raising (the reference raises on the first unknown object);
  *  - blank lines are dropped, not treated as EOF (the reference stops at
  *    the first blank line — ingest_jsonfile.py:32-33 — an acknowledged
  *    quirk that loses data; we read the whole file).
  */
object Ndjson {

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(Schemas.rawNdjson)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** [[read]] plus three scan-time order columns (`_f`, `_b`, `_m`: file
    * name, file-block start, per-partition row counter) whose
    * lexicographic order is EXACTLY byte order within each file — a block
    * is a contiguous file range, blocks of one file never share a task,
    * and the counter increments in read order inside a task. The order is
    * therefore invariant under any split plan (`maxPartitionBytes`,
    * executor count), which is what makes a split-independent `_seq`
    * derivable from it ([[fileOrderSeq]]). Across files the order is the
    * file-name sort. Columns must be attached at scan time — evaluated
    * after a shuffle they'd read empty. */
  def readOrdered(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
      .withColumn("_f", input_file_name())
      .withColumn("_b", expr("input_file_block_start()"))
      .withColumn("_m", monotonically_increasing_id())

  /** Collapse the [[readOrdered]] order columns into a per-key `_seq`:
    * `row_number()` over (file, block, row) within each key — the
    * within-batch precedence [[graft.operators.Merge.upsert]] consumes.
    * Per-KEY, not global, on purpose: a global file-order rank would be a
    * total sort of the batch; the merge only ever compares `_seq` within
    * one `idstr`, so ranking inside the key partition gives the same
    * winner (and the same edit-CDC order) for one hash exchange sized by
    * the batch — the same key the merge immediately shuffles on anyway.
    *
    * The window key must equal the MERGE key: the merge keys on `idstr` =
    * entity prefix + strip-prefix(coalesce(name, id)) (Normalize), so the
    * window partitions by that same stripped coalesce — two raw rows with
    * different `id`/`name` spellings that normalize to ONE idstr (e.g.
    * name "t3_aaa" vs bare id "aaa") land in ONE window partition and get
    * ORDERED `_seq` values, not a split-plan-dependent tie. Matches the
    * reference's sequential last-wins replay (tsdb.py:389-461) for any
    * physical read plan. */
  def fileOrderSeq(df: DataFrame): DataFrame = {
    val mergeKey = regexp_replace(coalesce(col("name"), col("id")),
      "^t[0-9]+_", "")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(mergeKey).orderBy("_f", "_b", "_m")
    df.withColumn("_seq", row_number().over(w).cast("long"))
      .drop("_f", "_b", "_m")
  }

  /** S2 type discrimination (ingest_jsonfile.py:12-23). Predicates are
    * null-safe (absent fields give NULL, and SQL three-valued logic would
    * otherwise silently drop rows from `unclassified`). */
  private def startsWith(c: String, p: String) =
    coalesce(col(c).startsWith(p), lit(false))
  val isSubmission =
    startsWith("name", "t3_") || col("over_18").isNotNull
  val isComment =
    startsWith("name", "t1_") ||
      startsWith("parent_id", "t3_") || startsWith("parent_id", "t1_") ||
      startsWith("link_id", "t3_")

  def submissionsRaw(df: DataFrame): DataFrame = clean(df).filter(isSubmission)
  def commentsRaw(df: DataFrame): DataFrame =
    clean(df).filter(!isSubmission && isComment)

  /** Malformed or blank lines, for quarantine counting. */
  def corrupt(df: DataFrame): DataFrame = df.filter(col("_corrupt_record").isNotNull)
  /** Parsed rows that match neither predicate (reference would raise). */
  def unclassified(df: DataFrame): DataFrame =
    clean(df).filter(!isSubmission && !isComment)

  private def clean(df: DataFrame): DataFrame =
    df.filter(col("_corrupt_record").isNull)
}
