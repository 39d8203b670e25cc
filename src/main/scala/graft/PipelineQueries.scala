package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out training-data-pipeline operators (dedup, similarity search,
  * text analysis, multimodal plumbing) over documents/embeddings. */
object PipelineQueries {
  val all: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracles: Map[String, String] = Map()
}
