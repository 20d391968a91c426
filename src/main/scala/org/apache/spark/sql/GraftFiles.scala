package org.apache.spark.sql

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.BucketSpec
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference,
  BoundReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In,
  IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Or, Predicate}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.datasources.{BucketingUtils, FileIndex,
  HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{DataType, StructType}

/** Per-file column statistics for DATA SKIPPING (the zone-map trick every
  * table format plays: Delta `add.stats`, Iceberg manifests' bounds):
  * min/max/nullCount per column plus the file's row count, with values
  * already in Catalyst runtime form (Int/Long/Double/Decimal/days-int…).
  * A column absent from the maps simply cannot prune — absence is always
  * safe, never wrong.
  *
  * `eqExclude` extends the range model to NON-RANGE partition layouts
  * (Iceberg's bucket[N] transform): per column, a prover that answers
  * "this literal value provably CANNOT occur in the file" (e.g. the
  * literal hashes to a different bucket). Consulted only for
  * equality/IN predicates whose literal type equals the column type —
  * same soundness contract as the range maps: a missing entry keeps
  * the file.
  */
final case class FileZone(numRecords: Option[Long],
    mins: Map[String, Any], maxs: Map[String, Any],
    nullCounts: Map[String, Long],
    eqExclude: Map[String, Any => Boolean] = Map.empty)

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
  *
  * `groups` carries one entry per PARTITION: its partition-column values
  * as an [[InternalRow]] (empty for an unpartitioned table) plus the
  * partition's file statuses. [[listFiles]] evaluates Spark's pushed
  * partition filters against those rows — metadata-only partition
  * pruning, the same mechanism `PartitioningAwareFileIndex` uses, except
  * the (value → files) map comes from recorded metadata (e.g. Delta
  * `add.partitionValues`) instead of directory-name parsing.
  */
final class ManifestFileIndex(parts: StructType,
    groups: Seq[(InternalRow, Array[FileStatus])],
    zones: Map[String, FileZone] = Map.empty) extends FileIndex {

  def this(files: Seq[FileStatus]) =
    this(StructType(Nil), Seq((InternalRow.empty, files.toArray)))

  override def rootPaths: Seq[Path] =
    groups.flatMap(_._2).map(_.getPath.getParent).distinct

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val selected =
      if (partitionFilters.isEmpty || parts.isEmpty) groups
      else {
        // bind by name against the partition schema, exactly like
        // PartitioningAwareFileIndex.prunePartitions; an unresolvable
        // attribute (shouldn't happen — Spark only pushes partition-
        // column predicates here) falls back to no pruning, never to a
        // wrong answer
        val predicate = partitionFilters.reduce(And)
        val resolvable = predicate.references.forall(a =>
          parts.fieldNames.contains(a.name))
        if (!resolvable) groups
        else {
          val bound = Predicate.createInterpreted(predicate.transform {
            case a: AttributeReference =>
              val idx = parts.fieldIndex(a.name)
              BoundReference(idx, parts(idx).dataType, nullable = true)
          })
          groups.filter { case (row, _) => bound.eval(row) }
        }
      }
    // DATA SKIPPING over recorded per-file column ranges: drop a file
    // only when a pushed predicate PROVES no row can match (zone-map
    // semantics); any construct the prover doesn't model keeps the file.
    // Keyed by the same path strings the statuses were built from.
    val skipped =
      if (zones.isEmpty || dataFilters.isEmpty) selected
      else selected.map { case (row, files) =>
        (row, files.filter { f =>
          zones.get(f.getPath.toString) match {
            case None => true
            case Some(z) => !dataFilters.exists(ZonePrune.excludes(_, z))
          }
        })
      }.filter(_._2.nonEmpty)
    skipped.map { case (row, files) => PartitionDirectory(row, files) }
  }

  override def inputFiles: Array[String] =
    groups.flatMap(_._2).map(_.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = groups.flatMap(_._2).map(_.getLen).sum

  override def partitionSchema: StructType = parts
}

/** The zone-map exclusion prover: can this pushed predicate be shown to
  * match NO row of a file, given the file's per-column [min, max] and
  * null counts? Sound by construction — only shapes it models can
  * exclude; everything else answers "keep". Comparisons use Catalyst's
  * interpreted ordering for the literal's type and fire only when the
  * attribute's type equals it (stats values are stored in that same
  * runtime form), so a mistyped foreign stat can never wrong-prune.
  */
private[sql] object ZonePrune {

  private def ord(dt: DataType): Ordering[Any] =
    TypeUtils.getInterpretedOrdering(dt)

  def excludes(e: Expression, z: FileZone): Boolean = e match {
    case And(l, r) => excludes(l, z) || excludes(r, z)
    case Or(l, r) => excludes(l, z) && excludes(r, z)
    case EqualTo(a: AttributeReference, Literal(v, dt)) =>
      outside(a, v, dt, z)
    case EqualTo(Literal(v, dt), a: AttributeReference) =>
      outside(a, v, dt, z)
    case GreaterThan(a: AttributeReference, Literal(v, dt))
        if a.dataType == dt && v != null => // need max > v
      z.maxs.get(a.name).exists(mx => ord(dt).lteq(mx, v))
    case GreaterThan(Literal(v, dt), a: AttributeReference)
        if a.dataType == dt && v != null => // need min < v
      z.mins.get(a.name).exists(mn => ord(dt).gteq(mn, v))
    case GreaterThanOrEqual(a: AttributeReference, Literal(v, dt))
        if a.dataType == dt && v != null =>
      z.maxs.get(a.name).exists(mx => ord(dt).lt(mx, v))
    case GreaterThanOrEqual(Literal(v, dt), a: AttributeReference)
        if a.dataType == dt && v != null =>
      z.mins.get(a.name).exists(mn => ord(dt).gt(mn, v))
    case LessThan(a: AttributeReference, Literal(v, dt))
        if a.dataType == dt && v != null =>
      z.mins.get(a.name).exists(mn => ord(dt).gteq(mn, v))
    case LessThan(Literal(v, dt), a: AttributeReference)
        if a.dataType == dt && v != null =>
      z.maxs.get(a.name).exists(mx => ord(dt).lteq(mx, v))
    case LessThanOrEqual(a: AttributeReference, Literal(v, dt))
        if a.dataType == dt && v != null =>
      z.mins.get(a.name).exists(mn => ord(dt).gt(mn, v))
    case LessThanOrEqual(Literal(v, dt), a: AttributeReference)
        if a.dataType == dt && v != null =>
      z.maxs.get(a.name).exists(mx => ord(dt).lt(mx, v))
    case In(a: AttributeReference, vs)
        if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
      vs.forall { case Literal(v, dt) => outside(a, v, dt, z) }
    case IsNull(a: AttributeReference) =>
      z.nullCounts.get(a.name).contains(0L)
    case IsNotNull(a: AttributeReference) =>
      (for (nr <- z.numRecords; nc <- z.nullCounts.get(a.name))
        yield nc == nr).getOrElse(false)
    case _ => false
  }

  /** v provably outside [min, max] of a.name, or excluded by the
    * file's non-range equality prover (bucket-transform layouts).
    */
  private def outside(a: AttributeReference, v: Any, dt: DataType,
      z: FileZone): Boolean =
    a.dataType == dt && v != null && (
      z.mins.get(a.name).exists(mn => ord(dt).gt(mn, v)) ||
      z.maxs.get(a.name).exists(mx => ord(dt).lt(mx, v)) ||
      z.eqExclude.get(a.name).exists(f => f(v)))
}

/** Bridge into `private[sql]` scan construction (same pattern as
  * [[GraftBridge]]): build a parquet DataFrame over an explicit
  * (path, size, modificationTime) file list with an explicit schema —
  * no listing, no footer reads, no schema inference at planning.
  */
object GraftFiles {

  private def status(f: (String, Long, Long)): FileStatus =
    new FileStatus(f._2, false, 1, 128L * 1024 * 1024, f._3, new Path(f._1))

  def parquet(spark: SparkSession, files: Seq[(String, Long, Long)],
      schema: StructType,
      zones: Map[String, FileZone] = Map.empty): DataFrame = {
    require(files.nonEmpty, "empty file list — nothing to scan")
    // zone keys must resolve to the statuses' rendered paths
    val z = zones.map { case (p, fz) => new Path(p).toString -> fz }
    relation(spark,
      new ManifestFileIndex(StructType(Nil),
        Seq((InternalRow.empty, files.map(status).toArray)), z),
      StructType(Nil), schema)
  }

  /** Bridge to Spark's bucket-id file-name parser (`_NNNNN` before the
    * extension) — the contract [[parquetBucketed]] file names must meet.
    */
  def bucketIdOf(fileName: String): Option[Int] =
    BucketingUtils.getBucketId(fileName)

  /** The `_NNNNN` suffix to stamp into a bucket's file names. */
  def bucketSuffix(bucketId: Int): String =
    BucketingUtils.bucketIdToString(bucketId)

  /** BUCKETED variant: the scan declares
    * `HashPartitioning(bucketCol, numBuckets)` as its output
    * partitioning, so an equi-join or aggregation on the bucket column
    * needs NO shuffle — the co-located-join story a bucketed table
    * format exists for. Every file name MUST carry its bucket id
    * (`_NNNNN`, see [[bucketSuffix]]) and every row in it MUST hash to
    * that bucket under `pmod(hash(col), n)` (Spark's own bucket hash);
    * callers enforce both at WRITE time — a violated claim silently
    * co-partitions wrong, which is why the reader also re-verifies the
    * names before choosing this path.
    */
  def parquetBucketed(spark: SparkSession, files: Seq[(String, Long, Long)],
      schema: StructType, numBuckets: Int, bucketCol: String,
      zones: Map[String, FileZone] = Map.empty): DataFrame = {
    require(files.nonEmpty, "empty file list — nothing to scan")
    require(schema.fieldNames.contains(bucketCol),
      s"bucket column '$bucketCol' not in ${schema.fieldNames.mkString(",")}")
    files.foreach { case (p, _, _) =>
      require(bucketIdOf(new Path(p).getName).isDefined,
        s"file $p carries no bucket id in its name — cannot scan bucketed")
    }
    val z = zones.map { case (p, fz) => new Path(p).toString -> fz }
    relation(spark,
      new ManifestFileIndex(StructType(Nil),
        Seq((InternalRow.empty, files.map(status).toArray)), z),
      StructType(Nil), schema,
      Some(BucketSpec(numBuckets, Seq(bucketCol), Nil)))
  }

  /** Partitioned variant: `groups` is (partition values in
    * `partitionSchema` field order, as CATALYST values — `UTF8String`
    * for strings, days-int for dates — plus that partition's files).
    * The scan fills the partition columns from the metadata rows (the
    * data files do not store them) and prunes partitions against pushed
    * filters without touching the filesystem.
    */
  def parquetPartitioned(spark: SparkSession,
      groups: Seq[(Seq[Any], Seq[(String, Long, Long)])],
      partitionSchema: StructType, dataSchema: StructType,
      zones: Map[String, FileZone] = Map.empty): DataFrame = {
    require(groups.nonEmpty, "empty partition list — nothing to scan")
    val built = groups.map { case (vals, files) =>
      require(vals.length == partitionSchema.length,
        s"partition row arity ${vals.length} != schema " +
          s"${partitionSchema.length}")
      (InternalRow.fromSeq(vals), files.map(status).toArray)
    }
    val z = zones.map { case (p, fz) => new Path(p).toString -> fz }
    relation(spark, new ManifestFileIndex(partitionSchema, built, z),
      partitionSchema, dataSchema)
  }

  private def relation(spark: SparkSession, index: FileIndex,
      partitionSchema: StructType, dataSchema: StructType,
      bucketSpec: Option[BucketSpec] = None): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val rel = HadoopFsRelation(
      index,
      partitionSchema = partitionSchema,
      dataSchema = dataSchema,
      bucketSpec = bucketSpec,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(cs)
    classic.Dataset.ofRows(cs, LogicalRelation(rel))
  }
}
