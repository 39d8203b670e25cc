package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Collaborative-filtering recommendation primitives over implicit
  * feedback (basket/item co-occurrence) — the classic item-item CF of
  * Sarwar et al. 2001 / Linden et al. 2003, in the engine's exact-
  * integer house style: cosine similarity over binary basket vectors is
  *
  *   cos(i, j) = c_ij / √(c_i · c_j)
  *
  * and rather than quantize a square root, the engine ranks by the
  * SQUARE — cos²_bp = c_ij²·10⁴ div (c_i·c_j) — which is monotone in
  * cosine, a ratio of exact integers, and therefore hash-gateable with
  * one floor division (the same no-sqrt device as the skyline/MAD
  * family).
  *
  * Scale shape: the basket self-join is keyed on the basket id (pair
  * fan-out bounded by Σ|basket|², the market-basket bound q_affinity
  * already carries); item marginals are |items|-bounded; the top-k is a
  * per-item window over each item's neighbor list, never a global sort.
  */
object Recommend {

  /** Top-k co-occurrence neighbors per item by (cos² desc, c_pair desc,
    * neighbor asc): (item, rank, rec, c_pair, cos2_bp). Items sharing no
    * basket with anything are absent (nothing to recommend from). */
  def itemNeighbors(baskets: DataFrame, basket: String, item: String,
      k: Int): DataFrame = {
    require(k >= 1)
    val bi = baskets.select(col(basket).as("b"), col(item).as("i"))
      .distinct().localCheckpoint(eager = false)
    val ci = bi.groupBy("i").agg(count(lit(1)).as("n_b"))
    val pairs = bi.as("a").join(bi.as("x"),
        col("a.b") === col("x.b") && col("a.i") < col("x.i"))
      .groupBy(col("a.i").as("i"), col("x.i").as("j"))
      .agg(count(lit(1)).as("c_pair"))
    itemNeighborsFrom(pairs, ci, k)
  }

  /** [[itemNeighbors]]' scoring core over PREBUILT (i < j, c_pair) pair
    * counts and (i, n_b) item marginals — the serving entry point for
    * the incrementally-maintained co-occurrence graph
    * ([[graft.streaming.StreamGraph]] keeps exactly these two row
    * classes as additive counters), so recommendations follow the
    * basket stream without a per-query corpus self-join. */
  def itemNeighborsFrom(pairs: DataFrame, marginals: DataFrame,
      k: Int): DataFrame = {
    require(k >= 1)
    val sym = pairs.select(col("i"), col("j"), col("c_pair"))
      .unionByName(
        pairs.select(col("j").as("i"), col("i").as("j"), col("c_pair")))
    val scored = sym
      .join(marginals.select(col("i"), col("n_b").as("ci")), "i")
      .join(marginals.select(col("i").as("j"), col("n_b").as("cj")), "j")
      .select(col("i").as("item"), col("j").as("rec"), col("c_pair"),
        expr("(c_pair * c_pair * 10000) div (ci * cj)").as("cos2_bp"))
    val w = Window.partitionBy("item")
      .orderBy(col("cos2_bp").desc, col("c_pair").desc, col("rec").asc)
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("item"), col("rank"), col("rec"), col("c_pair"),
        col("cos2_bp"))
  }
}
