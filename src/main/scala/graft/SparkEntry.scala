package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + COVERAGE.md.
  *
  * Each entry in [[queries]] demonstrates one operator from SURVEY.md §2
  * (or a scale-out training-data-pipeline operator) over the driver parquet
  * tables; [[oracleSql]] carries the equivalent ANSI SQL that DuckDB runs on
  * the same tables for the hash-compare correctness gate.
  *
  * Determinism rules (FIXTURES.md §4): total ORDER BY with key tiebreaks,
  * money/ratio outputs as scaled BIGINT ("cents"), UTC everywhere.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Pricing-summary aggregate (SURVEY §2.4 A1-family) over lineitem. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.all ++ TimesearchQueries.all ++ PipelineQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ TimesearchQueries.oracles ++ PipelineQueries.oracles

  /** [[oracleSql]] with file-fixture paths bound to the sf directory the
    * verification actually runs at (Verify passes its own sfDir) —
    * removes any run-ordering dependence on a hard-coded fixture path. */
  def oracleSqlAt(sfDir: String): Map[String, String] = {
    val sfName = new java.io.File(sfDir).getName
    RelationalQueries.oracles ++
      TimesearchQueries.oraclesAt(sfName) ++
      PipelineQueries.oraclesAt(sfName)
  }
}
