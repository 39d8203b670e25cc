package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond [[Dedup.clusters]]' connected
  * components: PageRank over the comment-reply graph ("which threads/
  * comments accumulate influence"), in the engine's auditable-numerics
  * house style.
  *
  * ==Integer-exact PageRank==
  * The textbook iteration r ← (1−d)/N + d·Σ r(u)/deg(u) runs on
  * doubles, whose partial-sum order is partition-dependent — a
  * hash-gate killer. This operator defines THE semantics as the
  * integer-quantized iteration at a fixed scale (10¹² units of total
  * mass):
  *
  *   r₀       = scale div N
  *   contrib  = (r·85 div 100) div deg        (per out-edge)
  *   r_{t+1}  = (scale·15 div 100) div N + Σ contrib
  *
  * Every step is exact long arithmetic — associative sums, engine-
  * independent division — so a fixed iteration count replays
  * relationally to the bit. Dangling nodes (no out-edges) leak their
  * damped mass by design (the "sink loss" convention), which is
  * deterministic and documented rather than the redistribute variant's
  * extra global aggregate per step.
  *
  * Scale shape: each iteration is one edge-join + one dst-aggregation
  * (two exchanges bounded by |edges|), with per-iteration
  * localCheckpoint so the lazy chain stays linear (the MMR lineage
  * lesson). N and the two per-run constants are driver-side scalars
  * from one count.
  */
object Graphs {

  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int,
      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && scale > 0)
    val ids = nodes.select(col("id")).localCheckpoint(false)
    val e = edges.select(col("src"), col("dst")).localCheckpoint(false)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(false)
    val n = ids.count()
    require(n > 0, "empty graph")
    val base = (scale * 15L / 100L) / n
    var rank = ids.select(col("id"), lit(scale / n).as("r"))
    for (_ <- 1 to iters) {
      val contrib = rank.join(e, col("id") === col("src"))
        .join(outdeg, "src")
        .select(col("dst"), expr("((r * 85) div 100) div deg").as("c"))
        .groupBy("dst").agg(sum("c").as("cin"))
        .withColumnRenamed("dst", "id")
      rank = ids
        .join(contrib, Seq("id"), "left")
        .select(col("id"), (lit(base) + coalesce(col("cin"), lit(0L))).as("r"))
        .localCheckpoint(false)
    }
    rank.select(col("id"), col("r").as("pr"))
  }
}
