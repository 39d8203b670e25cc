package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse temporal operators: SCD Type-2 dimension construction from a
  * change log, and snapshot diffing (Delta CDF-style change classification).
  *
  * Reference behavior analog: timesearch keeps only the latest row per id
  * (edit CDC, see Merge.upsert); SCD2 is the warehouse-standard
  * generalization that PRESERVES history as validity intervals — the
  * operator a reference user would need to time-travel attributes.
  *
  * Scale: both operators are one-exchange shapes. [[buildType2]] shuffles
  * once on the entity key and runs its three window passes over that same
  * (key, ts) sort — Spark plans a single Sort under all of them.
  * [[diff]] is a single full-outer sort-merge join on the key; with both
  * snapshots bucketed at rest (sources/Store.writeBucketed) it runs with
  * zero exchanges.
  */
object Scd {

  /** Collapse a change log (key, ts, attr) into SCD Type-2 validity
    * intervals: one row per run of identical consecutive `attr` values per
    * key, with [valid_from, valid_to) interval bounds and a 1-based
    * version counter. `valid_to` is -1 (open) for the current row.
    * `tieBreak` makes equal-timestamp log entries deterministic.
    */
  def buildType2(log: DataFrame, key: String, tsSec: Column, attr: Column,
      tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col("ts_sec"), col("tb"))
    val runs = log
      .select(col(key), tsSec.as("ts_sec"), attr.as("attr"), tieBreak.as("tb"))
      .withColumn("prev_attr", lag("attr", 1).over(w))
      // run heads: first log entry per key, or an attribute change
      .filter(col("prev_attr").isNull || col("prev_attr") =!= col("attr"))
    val wh = Window.partitionBy(key).orderBy(col("ts_sec"), col("tb"))
    runs
      .withColumn("version", row_number().over(wh).cast("long"))
      .withColumn("valid_to",
        coalesce(lead("ts_sec", 1).over(wh), lit(-1L)))
      .select(col(key), col("version"), col("attr"),
        col("ts_sec").as("valid_from"), col("valid_to"))
  }

  /** Classify rows between two snapshots of a keyed table: `added`
    * (key only in `newer`), `removed` (key only in `older`), `changed`
    * (key in both, any compared column differs). Unchanged keys are
    * dropped. `compare` lists the columns participating in change
    * detection; each appears in the output as before_<c> / after_<c>.
    */
  def diff(older: DataFrame, newer: DataFrame, key: String,
      compare: Seq[String]): DataFrame = {
    val o = compare.foldLeft(older.select(col(key) +: compare.map(col): _*)) {
      (d, c) => d.withColumnRenamed(c, s"before_$c")
    }.withColumn("_in_old", lit(1))
    val n = compare.foldLeft(newer.select(col(key) +: compare.map(col): _*)) {
      (d, c) => d.withColumnRenamed(c, s"after_$c")
    }.withColumn("_in_new", lit(1))
    val joined = o.join(n, Seq(key), "full_outer")
    val differs = compare
      .map(c => !(col(s"before_$c") <=> col(s"after_$c")))
      .reduce(_ || _)
    joined
      .withColumn("change",
        when(col("_in_old").isNull, lit("added"))
          .when(col("_in_new").isNull, lit("removed"))
          .when(differs, lit("changed")))
      .filter(col("change").isNotNull)
      .drop("_in_old", "_in_new")
  }
}
