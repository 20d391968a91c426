package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Writer for the reference's RAW Kafka-Connect sink layout —
  * `<root>/<topic>/<yyyy-MM-dd>/<HH>/<partition>-<offset>.json`, NDJSON,
  * `flushSize` messages per file (reference `connectors/s3-sink.json:13-14`:
  * `flush.size=20`, the Aiven S3 sink's `file.name.template`). Together with
  * [[ForeignLake]] (the read side) this makes the engine a drop-in peer of
  * the reference's sink: it can land into and consume from the same bucket
  * layout an existing Kafka-Connect deployment uses.
  *
  * Mechanics: rows are hash-partitioned by (topic, date, hour) so one task
  * owns each target directory, then streamed through a bounded `flushSize`
  * buffer — memory per task is O(flushSize lines), never the partition.
  * File names are `<sparkPartitionId>-<ordinal of the chunk's first record
  * within the task's directory stream>.json` — the analog of the reference
  * template's Kafka start-offset (a stream position, not a payload field),
  * unique by construction even when LSNs repeat (replayed events, tombstone
  * sentinels) and deterministic given the same partitioning. Files are
  * created no-clobber: colliding with an existing file (e.g. a re-run into
  * a non-empty directory) fails the task loudly instead of silently
  * overwriting landed data.
  *
  * Tombstones/heartbeats (null envelope value → null event time and lsn,
  * see [[Landing.landingTransform]]) are routed to the epoch directory
  * `1970-01-01/00` with a 0 lsn — the fixed-path fallback for keyless
  * messages that [[ForeignLakeSpec]] mirrors — rather than NPE-ing the
  * task or writing literal `null/null` path segments; real CDC streams
  * always contain them.
  *
  * Hadoop `FileSystem` handles the IO, so `root` may be any supported
  * scheme (local, `s3a://`, ...); the driver's Hadoop conf is shipped as a
  * plain `Map` (public API only).
  *
  * Use from `foreachBatch` for streaming, or directly for batch backfills.
  */
object RawLakeWriter {

  /** Write `(topic, event_date, event_hour, line, lsn)` rows (the
    * [[Landing.landingTransform]] columns) into the raw template under
    * `root`.
    */
  def writeBatch(batch: DataFrame, root: String, flushSize: Int = 20): Unit = {
    require(flushSize > 0, "flushSize must be positive")
    val spark = batch.sparkSession
    // Ship the Hadoop conf as data — executors rebuild it; covers s3a
    // endpoint/credential settings applied via GraftSession.withS3a.
    val confMap = {
      val c = spark.sparkContext.hadoopConfiguration
      val it = c.iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
      b.result()
    }

    batch
      .select(col("topic"),
        // epoch-dir fallback for tombstones/heartbeats (null event time)
        coalesce(col("event_date"), lit("1970-01-01")).as("event_date"),
        coalesce(col("event_hour"), lit("00")).as("event_hour"),
        col("line"), coalesce(col("lsn"), lit(0L)).as("lsn"))
      .repartition(col("topic"), col("event_date"), col("event_hour"))
      .sortWithinPartitions(col("topic"), col("event_date"),
        col("event_hour"), col("lsn"))
      .foreachPartition { rows: Iterator[Row] =>
        val conf = new Configuration(false)
        confMap.foreach { case (k, v) => conf.set(k, v) }
        val part = TaskContext.getPartitionId()
        var dirKey: (String, String, String) = null
        // ordinal of the next record within the current directory's stream —
        // the file-name "offset" (unique even when lsns repeat)
        var dirOrdinal = 0L
        val buf = new scala.collection.mutable.ArrayBuffer[String]
        def flush(): Unit = if (buf.nonEmpty) {
          val (topic, date, hour) = dirKey
          val path = new Path(
            s"$root/$topic/$date/$hour/$part-${dirOrdinal - buf.size}.json")
          val fs = path.getFileSystem(conf)
          // no .crc sidecars — a sink directory should hold only the
          // template-named files (object stores never have them anyway)
          fs.setWriteChecksum(false)
          // no-clobber: overwrite=false throws FileAlreadyExistsException
          // instead of silently replacing previously landed rows
          val out = fs.create(path, false)
          try buf.foreach { line =>
            out.write(line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            out.write('\n')
          } finally out.close()
          buf.clear()
        }
        rows.foreach { r =>
          val key = (r.getString(0), r.getString(1), r.getString(2))
          if (key != dirKey) { flush(); dirKey = key; dirOrdinal = 0L }
          buf += r.getString(3)
          dirOrdinal += 1
          if (buf.size >= flushSize) flush()
        }
        flush()
      }
  }
}
