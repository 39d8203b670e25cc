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
    // AdaptiveSparkPlan's tree string appends the pre-AQE "Initial Plan"
    // section — counting it would double every node: keep the final only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // ReusedExchange is a leaf that PRINTS its wrapped exchange in its
    // own line ("ReusedExchange [...], Exchange hashpartitioning(...)"),
    // so exchange patterns must not count lines that are reuses
    val ownLines = plan.linesIterator
      .filterNot(_.contains("ReusedExchange")).mkString("\n")
    def n(p: String) = p.r.findAllIn(ownLines).length
    def nAll(p: String) = p.r.findAllIn(plan).length
    // codegen spans appear as "*(id)" operator prefixes in tree strings
    val codegenSpans = """\*\((\d+)\)""".r.findAllMatchIn(plan)
      .map(_.group(1)).toSet.size
    println(s"[explain] exchanges=${n("Exchange hashpartitioning")} " +
      s"reused=${nAll("ReusedExchange")} broadcasts=${n("BroadcastExchange")} " +
      s"scans=${n("Scan parquet")} wholestage=$codegenSpans")
    spark.stop()
  }
}
