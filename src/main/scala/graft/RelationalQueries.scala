package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational operator inventory (SURVEY.md §2.2-§2.8) expressed over
  * the driver's TPC-H-ish tables. Role mapping per FIXTURES.md §3:
  * orders/lineitem ≈ submissions/comments, customer ≈ authors.
  *
  * Money/quantity aggregates use the "cents" convention: ROUND(x*100) cast
  * to BIGINT before SUM, so both engines do exact integer arithmetic and
  * hash-compare reliably (doubles are never summed directly).
  */
object RelationalQueries {

  /** ROUND(x*100) -> BIGINT; exact in both engines for 2dp money values. */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1/A2-family hash aggregate with map-side partial agg; at 100 TB this
    // is one shuffle on (l_returnflag, l_linestatus) — low cardinality, so
    // partial aggregation collapses almost all rows before the exchange.
    "q1_agg" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(cents(col("l_quantity"))).as("sum_qty_c"),
          sum(cents(col("l_extendedprice"))).as("sum_price_c"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price_c"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
         CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_c,
         CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_price_c,
         COUNT(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus"""
  )
}
