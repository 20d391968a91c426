package graft.streaming

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Delta-protocol interop for the manifest-committed table format.
  *
  * [[export]] publishes the table's latest committed snapshot as one more
  * version of a Delta transaction log (`_delta_log/<v>.json` under the
  * table root, per the OPEN Delta protocol spec: `protocol`, `metaData`,
  * `add`/`remove` actions as newline-delimited JSON) — so any engine that
  * speaks the Delta protocol (Spark+delta-jars, delta-rs, DuckDB's delta
  * extension, Trino) reads the exported snapshot AS a Delta table, files
  * in place, nothing copied. This closes the gap the symlink-manifest
  * export (`MergeInto.exportFileManifest`) leaves: that one needs a
  * reader that understands a flat file list; this one targets the
  * ecosystem's actual interchange protocol.
  *
  * [[read]]/[[readAt]] are the inverse: a minimal NATIVE Delta log reader
  * (protocol 1, unpartitioned, no deletion vectors / column mapping —
  * anything newer is refused LOUDLY by name, never misread), used both to
  * self-verify exports and to consume plain foreign Delta tables without
  * delta jars on the classpath.
  *
  * Scale notes: the log replay is O(actions) driver-side JSON over data
  * that is one line per file-level change — the same metadata volume every
  * Delta reader processes; data reads pass the log's `schemaString`
  * explicitly, so planning opens zero parquet footers (same discipline as
  * `MergeInto.SchemaSlot`). Exports are incremental: version N+1 carries
  * only the add/remove DIFF against the previously exported live set, not
  * a re-listing of the table.
  */
object DeltaExport {

  private val LogDir = "_delta_log"
  private val VersionFile = """^(\d{20})\.json$""".r

  private def mapper = new ObjectMapper()

  private case class LogState(
      version: Long, // latest delta version present, -1 if none
      schemaJson: Option[String], // last metaData.schemaString
      live: Map[String, (Long, Long)]) // rel path -> (size, modTime)

  private def logPath(root: String) = new Path(root, LogDir)

  private def listVersions(fs: FileSystem, root: String): Seq[(Long, Path)] = {
    val dir = logPath(root)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq.flatMap { st =>
      st.getPath.getName match {
        case VersionFile(v) => Some((v.toLong, st.getPath))
        case _ => None
      }
    }.sortBy(_._1)
  }

  private def readLines(fs: FileSystem, p: Path): Seq[String] = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toVector
    finally in.close()
  }

  /** Replay the log strictly: versions must be dense from 0 (a gap means
    * a reader would reconstruct the wrong table — fail, don't guess), and
    * any protocol feature beyond reader version 1 is refused by name.
    */
  private def replay(fs: FileSystem, root: String,
      upTo: Option[Long]): LogState = {
    val versions = listVersions(fs, root)
    if (versions.isEmpty) return LogState(-1L, None, Map.empty)
    require(versions.head._1 == 0L,
      s"delta log at $root/$LogDir does not start at version 0 " +
        s"(first=${versions.head._1}) — checkpoint-only logs are not " +
        "supported by this reader")
    versions.map(_._1).sliding(2).foreach {
      case Seq(a, b) => require(b == a + 1,
        s"delta log at $root/$LogDir has a version gap: $a -> $b")
      case _ => ()
    }
    upTo.foreach { v =>
      require(versions.exists(_._1 == v),
        s"no delta version $v under $root/$LogDir " +
          s"(have 0..${versions.last._1})")
    }
    val m = mapper
    var schemaJson: Option[String] = None
    val live = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
    versions.takeWhile(v => upTo.forall(v._1 <= _)).foreach { case (_, p) =>
      readLines(fs, p).foreach { line =>
        val node = m.readTree(line)
        if (node.has("protocol")) {
          val pr = node.get("protocol")
          val mrv = pr.get("minReaderVersion").asInt()
          require(mrv <= 1 && !pr.has("readerFeatures"),
            s"delta table at $root needs reader version $mrv" +
              (if (pr.has("readerFeatures"))
                s" with features ${pr.get("readerFeatures")}" else "") +
              " — this native reader implements protocol 1 only")
        } else if (node.has("metaData")) {
          val md = node.get("metaData")
          val provider = md.get("format").get("provider").asText()
          require(provider == "parquet",
            s"delta table at $root stores '$provider' data files — only " +
              "parquet is supported")
          val parts = md.get("partitionColumns")
          require(parts == null || parts.size() == 0,
            s"delta table at $root is partitioned ($parts) — partition-" +
              "value reconstruction is not implemented; read it with a " +
              "full Delta engine")
          schemaJson = Some(md.get("schemaString").asText())
        } else if (node.has("add")) {
          val a = node.get("add")
          require(!a.has("deletionVector"),
            s"delta table at $root carries deletion vectors — protocol-3 " +
              "feature this native reader refuses rather than misread")
          live += a.get("path").asText() ->
            (a.get("size").asLong(), a.get("modificationTime").asLong())
        } else if (node.has("remove")) {
          live -= node.get("remove").get("path").asText()
        } // commitInfo/txn/cdc actions carry no table state for us
      }
    }
    LogState(upTo.getOrElse(versions.last._1), schemaJson, live.toMap)
  }

  /** The snapshot's data files as table-root-relative paths. Same listing
    * the symlink export uses; relative because Delta `add.path` is
    * resolved against the table root.
    */
  private def snapshotFiles(fs: FileSystem, root: String,
      snap: ManifestStore.Snapshot): Seq[(String, Long, Long)] = {
    val rootUri = new Path(root).toUri.getPath.stripSuffix("/")
    ManifestStore.resolvePaths(root, snap).flatMap { dir =>
      val it = fs.listFiles(new Path(dir), true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
      while (it.hasNext) {
        val f = it.next()
        val name = f.getPath.getName
        if (name.endsWith(".parquet") || name.startsWith("part-")) {
          val abs = f.getPath.toUri.getPath
          require(abs.startsWith(rootUri + "/"),
            s"data file $abs lies outside the table root $rootUri — " +
              "cannot express it as a relative delta add path")
          buf += ((abs.stripPrefix(rootUri + "/"), f.getLen,
            f.getModificationTime))
        }
      }
      buf
    }.sortBy(_._1)
  }

  private def tableSchema(spark: SparkSession, root: String,
      snap: ManifestStore.Snapshot): StructType =
    snap.entries.get(MergeInto.SchemaSlot)
      .map(j => DataType.fromJson(j).asInstanceOf[StructType])
      .getOrElse(spark.read.option("mergeSchema", "true")
        .parquet(ManifestStore.resolvePaths(root, snap): _*).schema)

  /** Publish the latest committed snapshot as the next delta version.
    * Idempotent: if the log's live state already equals the snapshot
    * (same files, same schema), nothing is written and the existing
    * version is returned. Refuses while a deletion vector is pending —
    * Delta readers cannot subtract our DV sidecar; materialize first.
    *
    * @return (deltaVersion, path of the version's log file)
    */
  def export(spark: SparkSession, root: String): (Long, String) = {
    val snap = ManifestStore.latest(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed table under $root"))
    require(!snap.entries.contains(MergeInto.DvSlot),
      s"table at $root has a pending deletion vector — Delta readers " +
        "cannot subtract it; run materializeDeletes before exporting")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = logPath(root).getFileSystem(conf)
    val prev = replay(fs, root, None)
    val files = snapshotFiles(fs, root, snap)
    val schema = tableSchema(spark, root, snap)
    val schemaJson = schema.json

    val current = files.map(f => f._1 -> (f._2, f._3)).toMap
    val version = prev.version + 1
    val existing = new Path(logPath(root), f"${prev.version}%020d.json")
    if (prev.version >= 0 && prev.live == current &&
        prev.schemaJson.contains(schemaJson))
      return (prev.version, existing.toString)

    val m = mapper
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    if (version == 0L) {
      val protocol = m.createObjectNode()
      protocol.putObject("protocol")
        .put("minReaderVersion", 1).put("minWriterVersion", 2)
      lines += m.writeValueAsString(protocol)
    }
    if (version == 0L || !prev.schemaJson.contains(schemaJson)) {
      val meta = m.createObjectNode()
      val md = meta.putObject("metaData")
      // stable table id: re-exports of the same root keep their identity
      md.put("id", java.util.UUID.nameUUIDFromBytes(
        new Path(root).toUri.getPath
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString)
      md.putObject("format").put("provider", "parquet").putObject("options")
      md.put("schemaString", schemaJson)
      md.putArray("partitionColumns")
      md.putObject("configuration")
      md.put("createdTime", System.currentTimeMillis())
      lines += m.writeValueAsString(meta)
    }
    val now = System.currentTimeMillis()
    (prev.live.keySet -- current.keySet).toSeq.sorted.foreach { path =>
      val n = m.createObjectNode()
      n.putObject("remove").put("path", path)
        .put("deletionTimestamp", now).put("dataChange", true)
      lines += m.writeValueAsString(n)
    }
    files.foreach { case (path, size, mtime) =>
      if (!prev.live.get(path).contains((size, mtime))) {
        val n = m.createObjectNode()
        n.putObject("add").put("path", path)
          .put("size", size).put("modificationTime", mtime)
          .put("dataChange", true).putObject("partitionValues")
        lines += m.writeValueAsString(n)
      }
    }

    val out = new Path(logPath(root), f"$version%020d.json")
    val tmp = new Path(logPath(root), s".tmp-${java.util.UUID.randomUUID}")
    fs.mkdirs(logPath(root))
    val os = fs.create(tmp, false)
    try os.write((lines.mkString("\n") + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
    if (!fs.rename(tmp, out)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"concurrent exporter already published $out — re-run export to " +
          "diff against the new log head")
    }
    (version, out.toString)
  }

  /** Read the exported table at its latest delta version. */
  def read(spark: SparkSession, root: String): DataFrame =
    readAt(spark, root, -1L)

  /** Read the exported table AS OF a delta version (time-travel interop);
    * -1 = latest.
    *
    * The scan is planned ENTIRELY from the log: file paths, sizes and
    * modification times come from the replayed `add` actions (that is
    * why the Delta protocol records them) and the schema from
    * `metaData.schemaString`, handed to Spark through
    * [[org.apache.spark.sql.GraftFiles]] — planning performs zero
    * filesystem listings and zero footer reads, exactly like a real
    * Delta engine. With `validate` (the default) every listed file is
    * first checked to exist so a stale log referencing vacuumed files
    * fails LOUDLY naming one, never silently reads a partial table;
    * pass `validate = false` on trusted logs to skip those O(files)
    * existence probes too (a missing file then surfaces at execution).
    */
  def readAt(spark: SparkSession, root: String, version: Long,
             validate: Boolean = true): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = logPath(root).getFileSystem(conf)
    val st = replay(fs, root, if (version < 0) None else Some(version))
    require(st.version >= 0, s"no delta log under $root/$LogDir")
    val schemaJson = st.schemaJson.getOrElse(throw new IllegalStateException(
      s"delta log at $root has no metaData action — not a valid table"))
    require(st.live.nonEmpty,
      s"delta version ${st.version} at $root lists no live files")
    val files = st.live.toSeq.sortBy(_._1)
      .map { case (rel, (size, mtime)) => (s"$root/$rel", size, mtime) }
    if (validate) {
      val dead = files.map(_._1).filterNot(p => fs.exists(new Path(p)))
      require(dead.isEmpty,
        s"delta log at $root references ${dead.size} missing file(s) — " +
          s"e.g. ${dead.head}; vacuumed after export? Re-export the " +
          "current snapshot")
    }
    org.apache.spark.sql.GraftFiles.parquet(spark, files,
      DataType.fromJson(schemaJson).asInstanceOf[StructType])
  }
}
