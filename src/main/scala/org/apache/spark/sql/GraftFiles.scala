package org.apache.spark.sql

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation,
  LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** A [[FileIndex]] fed from table-format metadata instead of filesystem
  * listings. Spark's path-based `spark.read.parquet(paths)` pays one
  * driver-side `getFileStatus`/`listStatus` per path at PLANNING time —
  * O(files) namenode/object-store round-trips that a manifest-committed
  * table format already knows the answers to (a Delta `add` action
  * carries `size` and `modificationTime` precisely so readers never ask
  * the filesystem). This index hands Spark those recorded statuses
  * directly: planning performs ZERO filesystem calls, and `sizeInBytes`
  * (the optimizer's broadcast-decision input) is the exact recorded sum
  * rather than a listing-derived estimate.
  */
final class ManifestFileIndex(files: Seq[FileStatus]) extends FileIndex {

  override def rootPaths: Seq[Path] =
    files.map(_.getPath.getParent).distinct

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    Seq(PartitionDirectory(InternalRow.empty, files.toArray))

  override def inputFiles: Array[String] =
    files.map(_.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = files.map(_.getLen).sum

  override def partitionSchema: StructType = StructType(Nil)
}

/** Bridge into `private[sql]` scan construction (same pattern as
  * [[GraftBridge]]): build a parquet DataFrame over an explicit
  * (path, size, modificationTime) file list with an explicit schema —
  * no listing, no footer reads, no schema inference at planning.
  */
object GraftFiles {

  def parquet(spark: SparkSession, files: Seq[(String, Long, Long)],
      schema: StructType): DataFrame = {
    require(files.nonEmpty, "empty file list — nothing to scan")
    val statuses = files.map { case (p, len, mtime) =>
      new FileStatus(len, false, 1, 128L * 1024 * 1024, mtime, new Path(p))
    }
    val cs = spark.asInstanceOf[classic.SparkSession]
    val relation = HadoopFsRelation(
      new ManifestFileIndex(statuses),
      partitionSchema = StructType(Nil),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(cs)
    classic.Dataset.ofRows(cs, LogicalRelation(relation))
  }
}
