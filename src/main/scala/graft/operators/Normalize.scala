package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions._

/** Ingest normalization: raw pushshift-shaped rows → canonical store rows
  * (SURVEY §2.2 P5/P6, §2.8; reference tsdb.py:389-509 insert paths +
  * pushshift.py:33-98 DummyObject fallbacks).
  *
  * Pure `DataFrame => DataFrame` column pipeline — single projection, fully
  * codegen'd, no shuffle: at 100 TB this is a map-only stage fused into the
  * JSON scan by whole-stage codegen.
  */
object Normalize {

  /** Raw submission rows → canonical 18-col submissions (tsdb.py:399-430). */
  def submissions(raw: DataFrame): DataFrame = {
    val selftext = htmlUnescape(coalesce(col("selftext"), lit("")))
    // URL rules (tsdb.py:401-409): selfpost → NULL; crosspost → parent
    // permalink; then relative /r/ links made absolute.
    val baseUrl =
      when(col("is_self"), lit(null).cast("string"))
        .when(col("crosspost_parent").isNotNull && size(col("crosspost_parent_list")) > 0,
          col("crosspost_parent_list").getItem(0).getField("permalink"))
        .otherwise(col("url"))
    val absUrl =
      when(baseUrl.startsWith("/r/"), concat(lit("https://reddit.com"), baseUrl))
        .otherwise(baseUrl)
    raw.select(Seq(
      b36decode(col("id")).as("idint"),
      t3Prefix(coalesce(col("name"), col("id"))).as("idstr"),
      col("created_utc").cast("long").as("created"),
      coalesce(col("is_self"), lit(false)).as("self"),
      coalesce(col("over_18"), lit(false)).as("nsfw"),
      authorOrDeleted(col("author")).as("author"),
      col("title").as("title"),
      absUrl.as("url"),
      selftext.as("selftext"),
      coalesce(col("score"), lit(0L)).as("score"),   // FALLBACK_ATTRIBUTES.score=0
      col("subreddit").as("subreddit"),
      col("distinguished").as("distinguish"),
      textlen(selftext).as("textlen"),
      coalesce(col("num_comments"), lit(0L)).as("num_comments"),
      col("link_flair_text").as("flair_text"),
      col("link_flair_css_class").as("flair_css_class"),
      lit(null).cast("long").as("augmented_at"),
      lit(null).cast("long").as("augmented_count"),
      editedEpoch.as("_edited")                       // carried for edit-CDC
    ) ++ passSeq(raw): _*)
  }

  /** Raw comment rows → canonical 11-col comments (tsdb.py:473-486). */
  def comments(raw: DataFrame): DataFrame = {
    val body = htmlUnescape(coalesce(col("body"), lit("")))
    // parent_id repair (pushshift.py:74-78): null → link_id; raw JSON int
    // (arrives as a digit string under the pinned StringType) → t1_ + b36.
    val parent =
      when(col("parent_id").isNull, col("link_id"))
        .when(col("parent_id").rlike("^[0-9]+$"),
          concat(lit("t1_"), b36encode(col("parent_id").cast("long"))))
        .otherwise(col("parent_id"))
    raw.select(Seq(
      b36decode(col("id")).as("idint"),
      t1Prefix(coalesce(col("name"), col("id"))).as("idstr"),
      col("created_utc").cast("long").as("created"),
      authorOrDeleted(col("author")).as("author"),
      parent.as("parent"),
      col("link_id").as("submission"),
      body.as("body"),
      coalesce(col("score"), lit(0L)).as("score"),
      col("subreddit").as("subreddit"),
      col("distinguished").as("distinguish"),
      textlen(body).as("textlen"),
      editedEpoch.as("_edited")
    ) ++ passSeq(raw): _*)
  }

  /** Within-batch precedence passthrough: a `_seq` computed at the source
    * (e.g. [[graft.sources.Ndjson.fileOrderSeq]]) survives normalization
    * so [[graft.Timesearch.ingestFrames]] can honor it. */
  private def passSeq(raw: DataFrame) =
    if (raw.columns.contains("_seq")) Seq(col("_seq")) else Seq.empty

  /** `edited` is JSON-dual-typed: false | epoch-seconds (tsdb.py:374-377).
    * Under the pinned string schema: "false" → null, numeric → long. */
  private def editedEpoch =
    when(col("edited").rlike("^[0-9]+(\\.[0-9]+)?$"), col("edited").cast("double").cast("long"))
      .otherwise(lit(null).cast("long"))
}
