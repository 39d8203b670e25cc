package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated parquet tables (TESTDATA.md).
  *
  * One parquet file per table under the scale-factor directory. At cluster
  * scale these would be partitioned directories; `spark.read.parquet` handles
  * both shapes identically, and Catalyst pushes filters/projections into the
  * scan either way.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is a nanosecond parquet timestamp, which Spark only reads
    // as a raw long (DuckDB truncates it to µs instead); queries convert
    // with `ts div 1e9`. Runtime-settable, so any driver session works.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register every table as a temp view so `spark.sql` mirrors the DuckDB
    * oracle's naming exactly. Idempotent per session+dir. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
