package graft.model

import org.apache.spark.sql.types._

/** Canonical store schemas, mirroring the reference DDL (tsdb.py:42-101)
  * with SQLite INT epochs/booleans widened to Spark types where lossless.
  *
  * One Parquet table per entity, partitioned by the archive `target`
  * (subreddit or user) — the Spark replacement for the reference's
  * one-SQLite-file-per-target layout (tsdb.py:19-32). At 100 TB this gives
  * partition pruning on target and splittable columnar scans; secondary
  * `idstr` indexes (tsdb.py:71,86) are replaced by broadcast/bloom joins.
  */
object Schemas {

  /** submissions — tsdb.py:51-70 (18 cols, canonical order). */
  val submissions: StructType = StructType(Seq(
    StructField("idint", LongType),
    StructField("idstr", StringType),
    StructField("created", LongType),
    StructField("self", BooleanType),
    StructField("nsfw", BooleanType),
    StructField("author", StringType),
    StructField("title", StringType),
    StructField("url", StringType),
    StructField("selftext", StringType),
    StructField("score", LongType),
    StructField("subreddit", StringType),
    StructField("distinguish", StringType),
    StructField("textlen", LongType),
    StructField("num_comments", LongType),
    StructField("flair_text", StringType),
    StructField("flair_css_class", StringType),
    StructField("augmented_at", LongType),
    StructField("augmented_count", LongType)))

  /** comments — tsdb.py:73-85 (11 cols). */
  val comments: StructType = StructType(Seq(
    StructField("idint", LongType),
    StructField("idstr", StringType),
    StructField("created", LongType),
    StructField("author", StringType),
    StructField("parent", StringType),
    StructField("submission", StringType),
    StructField("body", StringType),
    StructField("score", LongType),
    StructField("subreddit", StringType),
    StructField("distinguish", StringType),
    StructField("textlen", LongType)))

  /** submission_edits / comment_edits — tsdb.py:88-99. */
  def edits(textCol: String): StructType = StructType(Seq(
    StructField("idstr", StringType),
    StructField(textCol, StringType),
    StructField("replaced_at", LongType)))
  val submissionEdits: StructType = edits("previous_selftext")
  val commentEdits: StructType = edits("previous_body")

  /** config KV — tsdb.py:46-49. */
  val config: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("value", StringType)))

  /** Pushshift-style NDJSON input (FIXTURES.md §1): union of submission and
    * comment fields, schema pinned (never inferred) so types are stable at
    * 100 TB (SURVEY §7.4.6). Absent fields read as null and are back-filled
    * by Normalize (pushshift.py:33-41 FALLBACK_ATTRIBUTES). `parent_id` is
    * StringType — Spark coerces raw JSON numbers into the string, which
    * Normalize detects and re-encodes as `t1_` + base36 (pushshift.py:77-78).
    */
  val rawNdjson: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("created_utc", DoubleType),
    StructField("author", StringType),
    StructField("subreddit", StringType),
    StructField("score", LongType),
    StructField("distinguished", StringType),
    StructField("edited", StringType),            // false | epoch — dual-typed in JSON
    // submission-only
    StructField("is_self", BooleanType),
    StructField("over_18", BooleanType),
    StructField("title", StringType),
    StructField("url", StringType),
    StructField("selftext", StringType),
    StructField("num_comments", LongType),
    StructField("link_flair_text", StringType),
    StructField("link_flair_css_class", StringType),
    StructField("crosspost_parent", StringType),
    StructField("crosspost_parent_list",
      ArrayType(StructType(Seq(StructField("permalink", StringType))))),
    // comment-only
    StructField("body", StringType),
    StructField("parent_id", StringType),
    StructField("link_id", StringType),
    StructField("_corrupt_record", StringType)))
}
