package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Reader for a lake laid out in the reference's RAW (non-Hive) path
  * template: `<root>/<topic>/<yyyy-MM-dd>/<HH>/<partition>-<offset>.json`
  * (reference `connectors/s3-sink.json:14` — the Aiven S3 sink's
  * `file.name.template`). A user pointing this engine at a bucket an
  * existing Kafka-Connect sink has been filling hits this layout
  * immediately; [[Landing]]'s own Hive-style lake is a documented
  * divergence, and this closes the read side of the gap.
  *
  * Partition semantics without Hive directories:
  *   - **pruning happens at file-listing time**, like Hive partition
  *     pruning: requested `dates`/`hours` narrow the glob the scan lists, so
  *     a day-slice of a year-deep lake never enumerates (let alone reads)
  *     the other days' files. On an object store the glob maps to prefix
  *     LIST calls — the same access pattern the reference's DuckDB queries
  *     use (`README.md:104` globs);
  *   - **path-derived columns** (`topic`, `event_date`, `event_hour`,
  *     `file_partition`, `file_offset`) are regex-extracted from
  *     `_metadata.file_path` — evaluated per FILE by the scan's constant
  *     metadata, not parsed per row from data.
  *
  * The decoded output is identical to reading [[Landing]]'s Hive layout:
  * same envelope parse, same flat change-log schema, plus the path columns.
  */
object ForeignLake {

  /** `<part>-<offset>.json` capture groups over the full file path. */
  private val PathRegex =
    ".*/([^/]+)/(\\d{4}-\\d{2}-\\d{2})/(\\d{2})/(\\d+)-(\\d+)\\.json$"

  /** Build the pruned glob list for the requested slices. Empty `dates` /
    * `hours` means "all" (a `*` glob component).
    */
  private[streaming] def globs(root: String, topic: String,
                               dates: Seq[String],
                               hours: Seq[String]): Seq[String] = {
    val ds = if (dates.isEmpty) Seq("*") else dates
    val hs = if (hours.isEmpty) Seq("*") else hours
    for (d <- ds; h <- hs) yield s"$root/$topic/$d/$h/*.json"
  }

  /** Read raw NDJSON lines from the foreign layout with path-derived
    * partition columns. `dates` (yyyy-MM-dd) and `hours` (HH, zero-padded)
    * prune the listing; empty = full scan.
    */
  def readLines(spark: SparkSession, root: String, topic: String,
                dates: Seq[String] = Nil, hours: Seq[String] = Nil): DataFrame =
    spark.read.format("text")
      .load(globs(root, topic, dates, hours): _*)
      .select(
        col("value").as("line"),
        col("_metadata.file_path").as("__path"))
      .select(
        col("line"),
        regexp_extract(col("__path"), PathRegex, 1).as("topic"),
        regexp_extract(col("__path"), PathRegex, 2).as("event_date"),
        regexp_extract(col("__path"), PathRegex, 3).as("event_hour"),
        regexp_extract(col("__path"), PathRegex, 4).cast("int")
          .as("file_partition"),
        regexp_extract(col("__path"), PathRegex, 5).cast("long")
          .as("file_offset"))

  private val PathCols =
    Seq("topic", "event_date", "event_hour", "file_partition", "file_offset")

  /** Read + decode: foreign layout → the same flat change log
    * [[Landing.readLake]] produces from the Hive layout (`decodeEnvelope`
    * columns), with the path-derived partition columns appended.
    */
  def read(spark: SparkSession, root: String, topic: String,
           payload: StructType, keyField: String = "id",
           dates: Seq[String] = Nil, hours: Seq[String] = Nil): DataFrame = {
    val schema = graft.model.Envelope.lineSchema(payload)
    // Native parse behind the Generate barrier: decodeEnvelope filters on
    // `log_seq_num IS NOT NULL` downstream, and a pushed-down filter would
    // re-parse every line (see graft.cdc.Decode.parseLineColumn).
    val withEnvelope = readLines(spark, root, topic, dates, hours)
      .select(explode(array(
          graft.functions.EnvelopeParse(col("line"), schema))).as("parsed") +:
        PathCols.map(col): _*)
      .select(col("parsed.value").as("value") +: PathCols.map(col): _*)
    graft.cdc.Decode.decodeEnvelope(withEnvelope, keyField, PathCols)
  }
}
