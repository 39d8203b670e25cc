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
