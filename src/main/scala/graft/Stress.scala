package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Out-of-RAM SCALE REHEARSAL — the closest a single box gets to the
  * 100 TB claim being EXERCISED rather than argued: multiply the sf
  * corpus past execution memory (the corpusWithDups union-with-offset
  * device, ×`SPARK_GRAFT_STRESS_MULT`), pin execution memory to a
  * sliver (`spark.memory.fraction`), and drive the three operator
  * shapes whose scale story depends on spilling gracefully — a wide
  * hash aggregation (falls back to sort-based agg under pressure), a
  * global range sort (ExternalSorter), and a two-key shuffle equi-join
  * (SortMergeJoin: both sides stream through the ExternalSorter spill
  * path, which is exactly why it — and not the memory-resident-build
  * ShuffledHashJoin — is the engine's unbounded-side join shape; every
  * engine SHJ use is size-gated) — then ASSERT three things:
  *
  *  1. the jobs COMPLETE (no OOM) with disk spill actually observed
  *     (task-metrics `diskBytesSpilled` > 0 — a rehearsal that fit in
  *     RAM proved nothing),
  *  2. results through the spill path are EXACT: the multiplied
  *     aggregate equals mult × the single-copy aggregate (associative
  *     integer sums), the sort's row count and boundary keys match,
  *  3. the plans keep their shapes (hash-partitioned agg exchange,
  *     range-partitioned sort exchange).
  *
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain
  * graft.Stress"`. Knobs: `SPARK_GRAFT_STRESS_MULT` (default 64 ⇒
  * ~38M lineitem rows at sf0.1), `SPARK_GRAFT_STRESS_MEMFRAC` (default
  * 0.02 ⇒ ~150 MB execution+storage on the 8g gate JVM). The defaults
  * are the MEASURED spill point on the gate box (mult 24 / frac 0.05
  * still fit: 0 bytes spilled, rehearsal void). Measured at defaults:
  * 38.4M rows, 670 MB disk / 4.3 GB memory spill, agg 9.4 s + sort
  * 2.7 s, every check green. Prints ONE JSON line (the Bench contract)
  * with timings, spill bytes, and check results; exits non-zero when
  * any check — INCLUDING spill-actually-happened — fails.
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_STRESS_MULT", "64").toInt
    val memFrac = sys.env.getOrElse("SPARK_GRAFT_STRESS_MEMFRAC", "0.02")
    require(mult >= 2, s"mult must be >= 2: $mult")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt)
      // the starvation IS the test: execution memory a sliver of the
      // heap so the multiplied corpus cannot possibly fit
      .config("spark.memory.fraction", memFrac)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    val spilledDisk = new java.util.concurrent.atomic.AtomicLong()
    val spilledMem = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          spilledDisk.addAndGet(m.diskBytesSpilled)
          spilledMem.addAndGet(m.memoryBytesSpilled)
        }
      }
    })

    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"),
        (col("l_quantity") * 100).cast("long").as("qty_c"),
        (col("l_extendedprice") * 100).cast("long").as("price_c"))
    // single-copy ground truth (associative integer sums: ×mult is exact)
    val base = li.agg(count(lit(1)).as("n"), sum("qty_c").as("sq"),
      sum("price_c").as("sp")).head()
    val (n1, sq1, sp1) = (base.getLong(0), base.getLong(1), base.getLong(2))

    // corpusWithDups at stress scale: union × mult with offset keys so
    // the group count ALSO multiplies (the agg hash table cannot reuse
    // the single-copy keys)
    val big = (0 until mult).map { i =>
      li.withColumn("l_orderkey",
        col("l_orderkey") + lit(i.toLong * 10000000000L))
    }.reduce(_ unionByName _)

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // 1. wide hash aggregation over mult× the groups
    val agg = big.groupBy("l_orderkey")
      .agg(sum("qty_c").as("sq"), sum("price_c").as("sp"),
        count(lit(1)).as("n"))
    val (aggTotals, tAgg) = timed {
      agg.agg(count(lit(1)), sum("sq"), sum("sp"), sum("n")).head()
    }
    val aggPlan = agg.queryExecution.executedPlan.toString
    val aggOk =
      aggTotals.getLong(0) == 0 + mult.toLong * countGroups(spark, li) &&
      aggTotals.getLong(1) == mult * sq1 &&
      aggTotals.getLong(2) == mult * sp1 &&
      aggTotals.getLong(3) == mult * n1 &&
      aggPlan.contains("Exchange hashpartitioning")

    // 2. global range sort of the multiplied corpus
    val sorted = big.orderBy(col("l_orderkey"), col("l_partkey"))
    val (sortHead, tSort) = timed { sorted.limit(1).collect()(0) }
    val sortPlan = sorted.queryExecution.executedPlan.toString
    val minKey = li.agg(min("l_orderkey")).head().getLong(0)
    val sortN = sorted.count()
    val sortOk = sortHead.getLong(0) == minKey &&
      sortN == mult * n1 &&
      sortPlan.contains("Exchange rangepartitioning")

    // 3. shuffle JOIN of the multiplied corpus against itself on a
    // two-part key: both join inputs exceed execution memory, so each
    // side's sort before the merge MUST spill. The per-stage delta (not
    // the global counter) is asserted, so agg/sort spill can't mask a
    // join that quietly fit. Expected cardinality is exact integer
    // arithmetic: keys are disjoint across replicas, so the self-join
    // yields mult × Σ c² rows for single-copy per-key counts c.
    val preJoinSpill = spilledDisk.get()
    val sumSq = li.groupBy("l_orderkey", "l_partkey")
      .agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c"))).head().getLong(0)
    val joined = big.select("l_orderkey", "l_partkey", "qty_c")
      .join(big.select("l_orderkey", "l_partkey", "price_c"),
        Seq("l_orderkey", "l_partkey"))
    val (joinN, tJoin) = timed { joined.count() }
    val joinPlan = joined.queryExecution.executedPlan.toString
    val joinSpill = spilledDisk.get() - preJoinSpill
    val joinOk = joinN == mult * sumSq &&
      joinPlan.contains("SortMergeJoin") &&
      joinPlan.contains("Exchange hashpartitioning") &&
      joinSpill > 0

    val spillOk = spilledDisk.get() > 0
    val ok = aggOk && sortOk && joinOk && spillOk
    println(
      s"""{"metric":"stress","sf":"$sfDir","mult":$mult,""" +
      s""""mem_fraction":$memFrac,"rows":${mult * n1},""" +
      s""""agg_sec":$tAgg,"sort_sec":$tSort,"join_sec":$tJoin,""" +
      s""""join_rows":$joinN,"join_spill_bytes":$joinSpill,""" +
      s""""disk_spill_bytes":${spilledDisk.get()},""" +
      s""""memory_spill_bytes":${spilledMem.get()},""" +
      s""""agg_ok":$aggOk,"sort_ok":$sortOk,"join_ok":$joinOk,""" +
      s""""spill_ok":$spillOk,""" +
      s""""ok":$ok}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }

  private def countGroups(spark: org.apache.spark.sql.SparkSession,
      li: org.apache.spark.sql.DataFrame): Long =
    li.select("l_orderkey").distinct().count()
}
