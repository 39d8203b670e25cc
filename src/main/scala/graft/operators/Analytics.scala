package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Offline analytics (SURVEY §2.4 A1-A3, §2.3 J3, §2.6 O1-O7;
  * breakdown.py, index.py, get_submissions.py/get_comments.py bounds). */
object Analytics {

  /** A1 — breakdown.py:8-42: per-key counts of submissions and comments
    * with zero-fill, plus total.
    *
    * Plan shape: two partial-aggregated counts unioned then re-aggregated —
    * map-side combine collapses each side to |keys| rows before the single
    * shuffle, which at 100 TB beats a full-outer join of two aggregates
    * (one exchange instead of three).
    */
  def breakdown(submissions: DataFrame, comments: DataFrame, key: String): DataFrame = {
    val subs = submissions.select(col(key).as("name"))
      .groupBy("name").agg(count(lit(1)).as("n_submissions"),
        lit(0L).as("n_comments"))
    val coms = comments.select(col(key).as("name"))
      .groupBy("name").agg(lit(0L).as("n_submissions"),
        count(lit(1)).as("n_comments"))
    subs.unionByName(coms)
      .groupBy("name")
      .agg(sum("n_submissions").as("n_submissions"),
        sum("n_comments").as("n_comments"))
      .withColumn("total", col("n_submissions") + col("n_comments"))
  }

  /** O7 — breakdown.py:55-82 output orderings. */
  def breakdownSorted(b: DataFrame, by: String): DataFrame = by match {
    case "name"        => b.orderBy(lower(col("name")).asc, col("name").asc)
    case "submissions" => b.orderBy(col("n_submissions").desc, lower(col("name")).asc, col("name").asc)
    case "comments"    => b.orderBy(col("n_comments").desc, lower(col("name")).asc, col("name").asc)
    case "total"       => b.orderBy(col("total").desc, lower(col("name")).asc, col("name").asc)
    case other => throw new IllegalArgumentException(
      s"unknown breakdown sort '$other' (valid: name, submissions, comments, total)")
  }

  /** P2 + O1-O5 — index.py:43-109: score-threshold filter + one of the
    * index sort orders. Global sort = range-partitioned exchange; the
    * filter is pushed to the parquet scan. Tiebreak on idstr keeps the
    * listing deterministic (SURVEY §7.4.4). */
  def indexListing(table: DataFrame, threshold: Long, sort: String): DataFrame = {
    val filtered = table.filter(col("score") >= threshold)
    val tie = col("idstr").asc
    sort match {
      case "date"   => filtered.orderBy(col("created").asc, tie)
      case "title"  => filtered.orderBy(col("title").asc, tie)
      case "score"  => filtered.orderBy(col("score").desc, tie)
      case "author" => filtered.orderBy(col("author").asc, tie)
      case "sub"    => filtered.orderBy(col("subreddit").asc, tie)
      // O5: flaired rows first, each group time-ordered (index.py:91-92)
      case "flair"  => filtered.orderBy(col("flair_text").isNull.asc, col("created").asc, tie)
      case other => throw new IllegalArgumentException(
        s"unknown index sort '$other' (valid: date, title, score, author, sub, flair)")
    }
  }

  /** A3 — incremental lower bound: max(created) − 1 overlap re-fetch
    * (get_submissions.py:52-61). TakeOrderedAndProject-free: plain max. */
  def incrementalBound(table: DataFrame): DataFrame =
    table.agg((max("created") - 1).as("lower_bound"))

  /** J3 — get_comments.py:47-55: newest comment whose submission has NOT
    * been augmented (NOT EXISTS anti-join). */
  def latestUnaugmented(comments: DataFrame, submissions: DataFrame): DataFrame =
    comments.join(
        submissions.filter(col("augmented_at").isNotNull).select(col("idstr").as("submission")),
        Seq("submission"), "left_anti")
      .orderBy(col("created").desc, col("idstr").desc)
      .limit(1)
}
