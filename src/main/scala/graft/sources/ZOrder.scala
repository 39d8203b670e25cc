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

  /** Interleave the low `bits` of two bucket ranks: a's bit k lands at
    * position 2k+1, b's at 2k (a is the "major" dimension at every
    * scale). Generated as a flat 2·bits-term integer sum — identical
    * shape in the SQL oracle. */
  def interleave(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { k =>
      (shiftright(a, k).bitwiseAND(lit(1L)) * lit(1L << (2 * k + 1))) +
        (shiftright(b, k).bitwiseAND(lit(1L)) * lit(1L << (2 * k)))
    }.reduce(_ + _)

  /** The matching SQL fragment (DuckDB) for [[interleave]] over column
    * expressions `a`/`b` — kept beside the Column form so the two can
    * never drift. */
  def interleaveSql(a: String, b: String, bits: Int): String =
    (0 until bits).map { k =>
      s"((($a >> $k) & 1) * ${1L << (2 * k + 1)} + (($b >> $k) & 1) * ${1L << (2 * k)})"
    }.mkString("(", " + ", ")")

  /** z-value of two long columns given their global [min, max] ranges. */
  def zValue(a: Column, aMn: Long, aMx: Long,
             b: Column, bMn: Long, bMx: Long, bits: Int = 8): Column =
    interleave(bucketOf(a, aMn, aMx, bits), bucketOf(b, bMn, bMx, bits), bits)

  /** Write `df` z-ordered on two long columns: one min/max aggregate
    * (4 scalars to the driver — stats-sized, the codebook contract),
    * range-repartition on the z-value into `numFiles` output files,
    * in-file sort by z. Filters on EITHER column then prune files via
    * parquet min/max stats. */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
      path: String, numFiles: Int, bits: Int = 8): Unit = {
    val r = df.agg(min(colA), max(colA), min(colB), max(colB)).head()
    val z = zValue(col(colA), r.getLong(0), r.getLong(1),
      col(colB), r.getLong(2), r.getLong(3), bits)
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
