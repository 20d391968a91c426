package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** STREAMING consumer of an exported table's CHANGE DATA FEED — the
  * `spark.readStream.format("delta").option("readChangeFeed", ...)` role,
  * expressed over the protocol's own layout with no delta jars: every
  * CDF-enabled export publishes its row-level diff as ONE parquet under
  * `_change_data/cdc-<v>-<uuid>.parquet`, so Spark's file stream source
  * over that directory IS an incremental change feed — each new version's
  * file is admitted exactly once (checkpoint-tracked), `_commit_version`
  * reconstructed from the protocol file name, ascending admission by
  * publication order (the source admits in modification-time order and
  * exports stamp versions monotonically).
  *
  * Semantics match Delta's `startingVersion=1` stream: the v0 snapshot is
  * the STARTING POINT a consumer bootstraps from ([[DeltaExport.read]] at
  * v0); the stream carries every change committed after it. A version
  * exported WITHOUT changeDataKey publishes no cdc file and is simply
  * absent — the same contract as [[DeltaExport.readChanges]], which
  * refuses such windows loudly in the batch API.
  *
  * Scale shape: the source lists only `_change_data` (never the table's
  * data files), admits each file once, and the per-batch work is the
  * changes themselves — O(changed rows), never O(table).
  */
object DeltaCdfStream {

  /** The change-row schema: the table's logical schema (bookkeeping
    * `__bucket` excluded — the exporter drops it from change data) plus
    * the protocol's `_change_type`.
    */
  def changeSchema(spark: SparkSession, root: String): StructType = {
    val table = DeltaExport.read(spark, root).schema
    StructType(table.fields.filterNot(_.name == "__bucket") :+
      StructField("_change_type", StringType, nullable = true))
  }

  /** The unbounded change stream (file-source incremental admission).
    * Pass an explicit `schema` for a not-yet-exported table; defaults to
    * [[changeSchema]] resolved from the current log.
    */
  def changes(spark: SparkSession, root: String,
              schema: StructType = null): DataFrame = {
    val logical = Option(schema).getOrElse(changeSchema(spark, root))
    // COLUMN-MAPPED tables: cdc files store PHYSICAL names like data
    // files — declare the file schema physically and alias back, or a
    // logical-named readStream schema would return silent NULLs. An
    // explicit caller schema is trusted as the FILE schema verbatim.
    val physOf: Map[String, String] =
      if (schema != null) Map.empty
      else DeltaExport.columnMapping(spark, root).map(_.swap)
    val fileSchema = StructType(logical.fields.map(f =>
      f.copy(name = physOf.getOrElse(f.name, f.name))))
    val raw = spark.readStream.schema(fileSchema)
      .option("pathGlobFilter", "cdc-*.parquet")
      .parquet(s"$root/_change_data")
      .withColumn("_commit_version",
        regexp_extract(col("_metadata.file_name"),
          "^cdc-(\\d{20})-", 1).cast(LongType))
    if (physOf.isEmpty) raw
    else raw.select((logical.fields.map(f =>
      raw(physOf.getOrElse(f.name, f.name)).as(f.name)) :+
      raw("_commit_version")).toIndexedSeq: _*)
  }

  /** Materialize the streamed feed of the delta-sink fixture table once
    * per store: an AvailableNow run of [[changes]] appended to a parquet
    * sink — the driver gate reads this and compares against the same
    * oracle as the batch `table_changes(1, 2)` read (the feeds must be
    * identical row sets; only the transport differs).
    */
  def materializedChangesDir(spark: SparkSession, root: String): String = {
    val out = s"$root/_streamed_cdf"
    val done = new java.io.File(out, "_DONE")
    if (done.exists()) return s"$out/data"
    val q = changes(spark, root)
      .writeStream
      .format("parquet")
      .option("path", s"$out/data")
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    done.getParentFile.mkdirs()
    require(done.createNewFile(), s"could not mark $out complete")
    s"$out/data"
  }
}
