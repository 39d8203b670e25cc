package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Warehouse/OLAP shapes added in r10: the rollup aggregation cascade,
  * pivot zero-fill, and the referential-integrity audit. The cascade spec
  * pins the one semantic risk of re-aggregating from the finest grain —
  * it must equal Spark's own Expand-based rollup level for level. */
class WarehouseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rollup cascade == Spark's Expand-based rollup (single-table form)") {
    val df = (1 to 400).map { i =>
      (s"r${i % 3}", s"n${i % 7}", (i * 13 % 997).toLong)
    }.toDF("r", "n", "v")
    // Expand-based reference (works on a join-free frame)
    val ref = df.rollup("r", "n")
      .agg(grouping_id().cast("long").as("lvl"), sum("v").as("sv"),
        count(lit(1)).as("c"))
      .select(col("lvl"), coalesce(col("r"), lit("ALL")).as("r"),
        coalesce(col("n"), lit("ALL")).as("n"), col("sv"), col("c"))
      .orderBy("lvl", "r", "n").collect().toSeq
    // The q_rollup cascade device
    val finest = df.groupBy("r", "n").agg(sum("v").as("sv"), count(lit(1)).as("c"))
    val lvl0 = finest.select(lit(0L).as("lvl"), col("r"), col("n"), col("sv"), col("c"))
    val lvl1 = finest.groupBy("r").agg(sum("sv").as("sv"), sum("c").as("c"))
      .select(lit(1L).as("lvl"), col("r"), lit("ALL").as("n"), col("sv"), col("c"))
    val lvl3 = finest.agg(sum("sv").as("sv"), sum("c").as("c"))
      .select(lit(3L).as("lvl"), lit("ALL").as("r"), lit("ALL").as("n"),
        col("sv"), col("c"))
    val got = lvl0.unionByName(lvl1).unionByName(lvl3)
      .orderBy("lvl", "r", "n").collect().toSeq
    assert(got === ref)
  }

  test("pivot: absent (month, class) cells zero-fill, never drop") {
    val df = Seq(
      (202401L, "A"), (202401L, "A"), (202401L, "B"),
      (202402L, "B")).toDF("ym", "pri")
    val piv = df.groupBy("ym").pivot("pri", Seq("A", "B", "C"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("A", "B", "C")).orderBy("ym").collect()
    assert(piv.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ===
      Seq((202401L, 2L, 1L, 0L), (202402L, 0L, 1L, 0L)))
  }

  test("integrity audit: planted violations are each counted once") {
    val parents = Seq((1L, "x"), (2L, "y"), (2L, "y2")).toDF("pk", "a") // dup pk=2
    val children = Seq((1L, 10L), (1L, 11L), (99L, 12L)).toDF("fk", "c") // orphan fk=99
    val orphans = children.join(parents, children("fk") === parents("pk"), "left_anti")
    val childless = parents.join(children, parents("pk") === children("fk"), "left_anti")
    val dups = parents.groupBy("pk").agg(count(lit(1)).as("c")).filter(col("c") > 1)
    assert(orphans.count() === 1L)
    assert(childless.count() === 2L) // both pk=2 rows lack children
    assert(dups.count() === 1L)
  }
}
