package org.apache.spark.sql.graftshim

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.datasources.{FileStatusCache,
  HadoopFsRelation, InMemoryFileIndex, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

import graft.sources.ZoneMap

/** Zone-map-aware `FileIndex`: Catalyst-integrated file skipping.
  *
  * [[graft.sources.ZoneMap.scanRange]] prunes with EXPLICIT bounds the
  * caller plumbs in; this class is the idiomatic-Spark completion of
  * that story — the same architecture Delta Lake and Iceberg use for
  * data skipping. `FileSourceScanExec` hands `listFiles` the pushed
  * data filters at physical planning; we prune the listing by the
  * sidecar stats BEFORE Spark plans a single split, so any
  * `.filter(...)`/SQL `WHERE` over a [[ZoneMap.scanAuto]] frame skips
  * non-intersecting files with zero API surface at the call site. The
  * residual predicate still runs (zone maps bound, they never prove
  * membership), parquet row-group stats still skip WITHIN survivors,
  * and files the sidecar does not cover are always kept — pruning can
  * accelerate, never decide.
  *
  * Lives in the `org.apache.spark.sql` namespace alongside
  * [[ColumnBridge]] because the file-source internals it extends
  * (`InMemoryFileIndex`, `HadoopFsRelation`, `LogicalRelation`,
  * `Dataset.ofRows`) are `private[sql]` extension points in Spark 4 —
  * this file and ColumnBridge are the engine's only internal-API
  * touches, kept to thin delegations.
  */
class ZoneMapFileIndex(spark: SparkSession, roots: Seq[Path],
    schema: StructType, stats: Seq[ZoneMap.Stat],
    blooms: Seq[ZoneMap.BloomStat] = Nil)
  extends InMemoryFileIndex(spark, roots, Map.empty[String, String],
    Some(schema), FileStatusCache.getOrCreate(spark), None, None) {

  def this(spark: SparkSession, root: Path, schema: StructType,
      stats: Seq[ZoneMap.Stat]) = this(spark, Seq(root), schema, stats, Nil)

  def this(spark: SparkSession, root: Path, schema: StructType,
      stats: Seq[ZoneMap.Stat], blooms: Seq[ZoneMap.BloomStat]) =
    this(spark, Seq(root), schema, stats, blooms)

  // sidecar rows keyed by URI path (input_file_name() and
  // FileStatus.getPath render the scheme differently — "file:///x" vs
  // "file:/x" — the path component is the stable join key)
  private val statsByPath: Map[String, Map[String, ZoneMap.Stat]] =
    stats.groupBy(s => pathKey(s.file))
      .map { case (k, ss) => k -> ss.map(s => s.col -> s).toMap }

  // bloom rows (equality/IN skipping) under the same key discipline
  private val bloomsByPath: Map[String, Map[String, ZoneMap.BloomStat]] =
    blooms.groupBy(b => pathKey(b.file))
      .map { case (k, bs) => k -> bs.map(b => b.col -> b).toMap }

  private def pathKey(p: String): String = new Path(p).toUri.getPath

  /** Last listing's file counts, driver-side observability for specs
    * and logs (listFiles runs on the driver during planning). -1 until
    * the first plan. */
  @volatile var lastListed: Int = -1
  @volatile var lastKept: Int = -1

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val base = super.listFiles(partitionFilters, dataFilters)
    val cons = ZoneMap.constraintsOf(dataFilters)
    val pruned =
      if (cons.isEmpty) base
      else base.map { pd =>
        PartitionDirectory(pd.values, pd.files.filter { f =>
          val key = pathKey(f.getPath.toString)
          statsByPath.get(key).forall(ZoneMap.fileSurvives(_, cons)) &&
            bloomsByPath.get(key).forall(ZoneMap.fileSurvivesBloom(_, cons))
        })
      }
    lastListed = base.iterator.map(_.files.size).sum
    lastKept = pruned.iterator.map(_.files.size).sum
    pruned
  }
}

object ZoneMapScan {

  /** Build a parquet scan over `path` routed through a
    * [[ZoneMapFileIndex]] loaded from the directory's sidecar. Schema
    * comes from the parquet footers (same inference a plain read does);
    * a missing/empty sidecar yields a frame that behaves exactly like
    * `spark.read.parquet(path)` — every file always survives. */
  def scan(spark: SparkSession, path: String): (DataFrame, ZoneMapFileIndex) = {
    val schema = spark.read.parquet(path).schema
    fromIndex(spark, new ZoneMapFileIndex(spark, new Path(path), schema,
      ZoneMap.read(path), ZoneMap.readBloom(path)), schema)
  }

  /** Same, over an EXPLICIT leaf-file list — the versioned-store read
    * path, where the manifest (not a directory listing) names the live
    * files of a version. Partition-encoding directory levels in the
    * paths are ignored: the schema is the caller's data schema and the
    * index parses no partition values. */
  def scanFiles(spark: SparkSession, files: Seq[String],
      schema: StructType, stats: Seq[ZoneMap.Stat],
      blooms: Seq[ZoneMap.BloomStat] = Nil):
      (DataFrame, ZoneMapFileIndex) = {
    val index = new ZoneMapFileIndex(spark, files.map(new Path(_)), schema,
      stats, blooms)
    fromIndex(spark, index, schema)
  }

  private def fromIndex(spark: SparkSession, index: ZoneMapFileIndex,
      schema: StructType): (DataFrame, ZoneMapFileIndex) = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val relation = HadoopFsRelation(index, partitionSchema = new StructType(),
      dataSchema = schema, bucketSpec = None, fileFormat = new ParquetFileFormat,
      options = Map.empty)(cs)
    (classic.Dataset.ofRows(cs, LogicalRelation(relation, isStreaming = false)),
      index)
  }
}
