package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical table layout for cluster scale (SURVEY §1.4).
  *
  * The reference keeps one SQLite file per archive target (subreddit /
  * user). The 100 TB analog is ONE logical table with a `target`
  * partition column — queries for a single target prune to its
  * directories at planning time — and bucketing on the row key so the
  * hot joins (upsert probe, merge_db anti-join, thread assembly) co-locate
  * without a shuffle.
  */
object Store {

  /** Write partitioned by archive target: `path/target=<t>/...`. A filter
    * on `target` prunes partitions at the scan (verify via
    * `PartitionFilters` in explain). */
  def writePartitioned(df: DataFrame, path: String,
      targetCol: String = "target"): Unit =
    df.write.mode("overwrite").partitionBy(targetCol).parquet(path)

  /** Write bucketed+sorted by the join key. Bucketing pins the hash
    * partitioning into the table layout: two tables bucketed the same way
    * join with ZERO exchanges (verify: no ShuffleExchange in the join
    * plan). Parquet bucketing requires the table-catalog API, so this
    * registers `name` in the session catalog with an explicit `path`. */
  def writeBucketed(df: DataFrame, name: String, path: String,
      key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(name)

  /** Read back a partitioned store, pruned to one target. */
  def readTarget(spark: SparkSession, path: String, target: String,
      targetCol: String = "target"): DataFrame =
    spark.read.parquet(path).filter(col(targetCol) === target)
}
