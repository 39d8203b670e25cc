package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the at-rest layout for
  * MULTI-column pruning (Delta/Iceberg's OPTIMIZE ZORDER BY): a linear
  * sort prunes scans filtered on the sort key and nothing else; bit-
  * interleaving two keys' bucket ranks gives every file a tight
  * bounding box in BOTH dimensions, so min/max row-group stats prune
  * selective filters on either column. Complements [[Store]]'s
  * bucketed layout (equi-join co-location) with range-predicate
  * locality.
  *
  * The z-value is PURE INTEGER arithmetic — per-column affine bucket
  * rank from the column's [min, max] (one cheap aggregate), then bit
  * interleave — so the curve position itself is engine-portable and
  * hash-gates (`q_zorder`), which is also what makes the layout
  * deterministic across writers: re-clustering the same data yields
  * the same file assignment.
  */
object ZOrder {

  /** Affine bucket rank of `v` in [mn, mx] over 2^bits buckets —
    * ((v − mn) · 2^bits) div (mx − mn + 1), exact integer semantics.
    * The Column API has no integer div, so the quotient is computed as
    * (x − x mod d) / d: the dividend is an exact multiple of d, both
    * sides are exactly representable (< 2^53), and IEEE division of an
    * exact multiple returns the exact integer quotient — so the cast
    * back to long is lossless and engine-portable (the oracle uses
    * DuckDB's native `//`, value-identical). */
  def bucketOf(v: Column, mn: Long, mx: Long, bits: Int): Column = {
    val d = mx - mn + 1L
    val x = (v - lit(mn)) * lit(1L << bits)
    ((x - (x % lit(d))) / lit(d)).cast("long")
  }

  /** The N-dimension bit layout: rank i's bit k lands at position
    * `n·k + (n−1−i)` — the first rank is the "major" dimension at every
    * scale, each subsequent one the next bit down, the straight
    * generalization of the classic 2-dim (2k+1, 2k) interleave (which
    * this REPRODUCES at n = 2 — one definition, every arity). The
    * interleaved value needs n·bits result bits, capped at 62 so the
    * flat integer sum stays inside a signed long. */
  private def requireArity(n: Int, bits: Int): Unit = {
    require(n >= 2, s"interleave needs >= 2 dimensions: got $n")
    require(bits >= 1 && n * bits <= 62,
      s"interleave: $n dims x $bits bits = ${n * bits} result bits " +
        "must fit a signed long (<= 62)")
  }

  /** Interleave the low `bits` of `ranks.size` bucket ranks (see the
    * layout note above). Generated as a flat n·bits-term integer sum —
    * identical shape in the SQL oracle. */
  def interleaveN(ranks: Seq[Column], bits: Int): Column = {
    val n = ranks.size
    requireArity(n, bits)
    (0 until bits).flatMap { k =>
      ranks.zipWithIndex.map { case (r, i) =>
        shiftright(r, k).bitwiseAND(lit(1L)) *
          lit(1L << (n * k + (n - 1 - i)))
      }
    }.reduce(_ + _)
  }

  /** The matching SQL fragment (DuckDB) for [[interleaveN]] over column
    * expressions — kept beside the Column form so the two can never
    * drift. */
  def interleaveSqlN(names: Seq[String], bits: Int): String = {
    val n = names.size
    requireArity(n, bits)
    (0 until bits).flatMap { k =>
      names.zipWithIndex.map { case (c, i) =>
        s"((($c >> $k) & 1) * ${1L << (n * k + (n - 1 - i))})"
      }
    }.mkString("(", " + ", ")")
  }

  /** Interleave the low `bits` of two bucket ranks: a's bit k lands at
    * position 2k+1, b's at 2k — [[interleaveN]] at arity 2. */
  def interleave(a: Column, b: Column, bits: Int): Column =
    interleaveN(Seq(a, b), bits)

  /** The matching SQL fragment (DuckDB) for [[interleave]]. */
  def interleaveSql(a: String, b: String, bits: Int): String =
    interleaveSqlN(Seq(a, b), bits)

  /** z-value of n long columns given their global [min, max] ranges:
    * per-column affine bucket rank, then the n-way interleave. */
  def zValueN(cols: Seq[(Column, Long, Long)], bits: Int = 8): Column =
    interleaveN(cols.map { case (c, mn, mx) => bucketOf(c, mn, mx, bits) },
      bits)

  /** z-value of two long columns given their global [min, max] ranges. */
  def zValue(a: Column, aMn: Long, aMx: Long,
             b: Column, bMn: Long, bMx: Long, bits: Int = 8): Column =
    zValueN(Seq((a, aMn, aMx), (b, bMn, bMx)), bits)

  /** Write `df` z-ordered on n long columns: one min/max aggregate
    * (2n scalars to the driver — stats-sized, the codebook contract),
    * range-repartition on the z-value into `numFiles` output files,
    * in-file sort by z. Filters on ANY of the columns then prune files
    * via parquet min/max stats. */
  def writeZOrderedN(df: DataFrame, cols: Seq[String],
      path: String, numFiles: Int, bits: Int = 8): Unit = {
    requireArity(cols.size, bits)
    val r = df.agg(cols.flatMap(c => Seq(min(c), max(c))).head,
      cols.flatMap(c => Seq(min(c), max(c))).tail: _*).head()
    val z = zValueN(cols.zipWithIndex.map { case (c, i) =>
      (col(c), r.getLong(2 * i), r.getLong(2 * i + 1)) }, bits)
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Two-column [[writeZOrderedN]]. */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
      path: String, numFiles: Int, bits: Int = 8): Unit =
    writeZOrderedN(df, Seq(colA, colB), path, numFiles, bits)
}
