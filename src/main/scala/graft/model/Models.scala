package graft.model

import org.apache.spark.sql.{DataFrame, Dataset}

/** Typed views of the canonical store rows (SURVEY §1.4): case classes
  * for the operators where compile-time field safety matters (tree
  * assembly, render, stateful streaming); the untyped `DataFrame` surface
  * stays primary for analytics where Catalyst sees through columns.
  *
  * Shapes mirror `Schemas` exactly (asserted in ModelSpec); nullable
  * SQLite columns map to Option fields.
  */
final case class Submission(
    idint: Long, idstr: String, created: Long, self: Boolean, nsfw: Boolean,
    author: String, title: Option[String], url: Option[String],
    selftext: Option[String], score: Long, subreddit: Option[String],
    distinguish: Option[String], textlen: Long, num_comments: Long,
    flair_text: Option[String], flair_css_class: Option[String],
    augmented_at: Option[Long], augmented_count: Option[Long])

final case class Comment(
    idint: Long, idstr: String, created: Long, author: String,
    parent: Option[String], submission: Option[String], body: String,
    score: Long, subreddit: Option[String], distinguish: Option[String],
    textlen: Long)

final case class CommentEdit(idstr: String, previous_body: String, replaced_at: Long)

object Models {
  def submissions(df: DataFrame): Dataset[Submission] = {
    import df.sparkSession.implicits._
    df.as[Submission]
  }
  def comments(df: DataFrame): Dataset[Comment] = {
    import df.sparkSession.implicits._
    df.as[Comment]
  }
}
