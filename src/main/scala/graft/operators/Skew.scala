package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * AQE's skew-join split handles sort-merge join skew at runtime; salting
  * remains the tool for the cases AQE cannot re-plan: a single giant
  * GROUP (one author with 10⁸ comments in a breakdown-style agg whose
  * partial aggregation misses, e.g. `collect_list`/`count_distinct`
  * buffers), or a shuffled join whose hot key exceeds what one task can
  * hold even after splitting. Salts are DETERMINISTIC (hash of a
  * secondary column) — no rand(), so plans stay replayable and
  * oracle-comparable.
  */
object Skew {

  private def saltOf(src: Column, salts: Int): Column =
    pmod(xxhash64(src), lit(salts.toLong)).cast("int")

  /** Equi-join a skewed fact side against a dimension: the dimension
    * replicates `salts`×, the fact side picks a deterministic salt, and
    * the join key becomes (key, salt) — a hot key spreads over `salts`
    * tasks. Row-identical to the unsalted join. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
      saltSrc: Column): DataFrame = {
    val factS = fact.withColumn("_salt", saltOf(saltSrc, salts))
    val dimS = dim.withColumn("_salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    factS.join(dimS, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-stage salted aggregation: stage 1 aggregates (key, salt) groups
    * — a giant group spreads over `salts` tasks — stage 2 combines the
    * partials. The caller supplies both stages (e.g. count → sum;
    * collect_list → flatten). */
  def saltedAgg(df: DataFrame, key: String, salts: Int, saltSrc: Column,
      partial: Seq[Column], combine: Seq[Column]): DataFrame =
    df.withColumn("_salt", saltOf(saltSrc, salts))
      .groupBy(col(key), col("_salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(combine.head, combine.tail: _*)
}
