package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Timesearch-semantics operators (SURVEY.md §2: ingest/store/analytics)
  * demonstrated over the driver tables (role mapping FIXTURES.md §3). */
object TimesearchQueries {
  val all: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracles: Map[String, String] = Map()
}
