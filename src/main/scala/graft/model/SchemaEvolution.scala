package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema versioning (SURVEY §1.2; tsdb.py:34-37 `DATABASE_VERSION` +
  * utilities/database_upgrader.py:24-49).
  *
  * The reference stamps `PRAGMA user_version` and runs sequential ALTERs
  * to migrate. On immutable columnar storage the equivalent is
  * read-side alignment: old archive files stay as written, and any
  * reader aligns them to the CURRENT schema — missing columns
  * materialize as typed nulls, dropped columns are pruned, and the
  * column order is canonicalized. Combined with parquet `mergeSchema`
  * this reads a directory containing several schema generations as one
  * table, with no rewrite of 100 TB of history.
  */
object SchemaEvolution {

  /** Current store schema version (tsdb.py:34). */
  val Version = 2

  /** Align `df` to `target`: add missing columns as typed nulls, drop
    * extras, cast matching names to the target type, restore canonical
    * order. Idempotent; aligning an already-current frame is a no-op
    * projection. */
  def alignTo(df: DataFrame, target: StructType): DataFrame = {
    val have = df.columns.toSet
    df.select(target.fields.map { f =>
      if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
  }

  /** The v1→v2 migration the reference ships (database_upgrader.py:24-40:
    * v2 added the edit-history columns/tables): a v1 submissions archive
    * aligns forward by materializing the later columns as nulls. */
  def upgradeSubmissions(df: DataFrame): DataFrame = alignTo(df, Schemas.submissions)
  def upgradeComments(df: DataFrame): DataFrame = alignTo(df, Schemas.comments)
}
