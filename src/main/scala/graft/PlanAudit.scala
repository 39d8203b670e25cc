package graft

import org.apache.spark.sql.DataFrame

/** Post-AQE physical-plan counters, shared by the [[Explain]] CLI and the
  * plan-shape specs — so a plan regression (e.g. the 3× corpus re-read
  * ReuseExchange miss the round-7 sweep found in bm25) fails a TEST
  * instead of surfacing as a bench mystery. Counts the FINAL adaptive
  * plan only (AdaptiveSparkPlan's tree string appends the pre-AQE
  * "Initial Plan" section — counting it would double every node) and
  * excludes ReusedExchange leaves from the exchange/broadcast/scan counts
  * (a reuse leaf PRINTS its wrapped exchange on its own line). */
object PlanAudit {
  final case class Counters(exchanges: Int, reused: Int, broadcasts: Int,
      scans: Int, wholestage: Int)

  /** Counters over the EXECUTED plan: run an action on `df` first — AQE
    * re-plans during execution, so the pre-action plan is only a guess. */
  def counters(df: DataFrame): Counters = {
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val ownLines = plan.linesIterator
      .filterNot(_.contains("ReusedExchange")).mkString("\n")
    def n(hay: String, p: String) = p.r.findAllIn(hay).length
    // codegen spans appear as "*(id)" operator prefixes in tree strings
    val codegenSpans = """\*\((\d+)\)""".r.findAllMatchIn(plan)
      .map(_.group(1)).toSet.size
    Counters(
      exchanges = n(ownLines, "Exchange hashpartitioning"),
      reused = n(plan, "ReusedExchange"),
      broadcasts = n(ownLines, "BroadcastExchange"),
      scans = n(ownLines, "Scan parquet"),
      wholestage = codegenSpans)
  }
}
