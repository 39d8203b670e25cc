package graft

import org.apache.spark.sql.execution.ExplainMode

/** Dev-loop plan auditor: prints the post-AQE executed plan of one
  * registered query (`runMain graft.Explain <query> [sfDir] [mode]`).
  * The query is EXECUTED first so adaptive re-planning (broadcast
  * demotions, skew splits, coalesced partitions) is what gets printed —
  * `explain()` before an action shows the pre-AQE guess. */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, s"usage: Explain <query> [sfDir] [mode]; " +
      s"queries: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val mode = if (args.length > 2) args(2) else "formatted"
    require(SparkEntry.queries.contains(name), s"unknown query '$name'")
    val spark = Sessions.local()
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    println(df.queryExecution.explainString(ExplainMode.fromString(mode)))
    // counter logic lives in PlanAudit (shared with the plan-shape specs)
    val c = PlanAudit.counters(df)
    println(s"[explain] exchanges=${c.exchanges} reused=${c.reused} " +
      s"broadcasts=${c.broadcasts} scans=${c.scans} wholestage=${c.wholestage}")
    spark.stop()
  }
}
