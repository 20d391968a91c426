package graft.streaming

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader,
  GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.col

/** Byte-level FORGES of the Iceberg v3 table shapes FOREIGN writers
  * produce and this library's exporter deliberately does not (it writes
  * spec v2): puffin deletion vectors, column initial-defaults, and
  * non-identity partition transforms. Fixture support for the driver
  * gates and specs that exercise [[IcebergExport.readAt]]'s v3 read
  * paths against tables we cannot otherwise construct offline — each
  * forge mirrors the metadata a Spark-4+Iceberg-1.8 or Flink writer
  * publishes, per the open spec (iceberg.apache.org/spec). LOCAL
  * filesystem only (java.io), as all fixture lakes are; hadoop
  * checksum sidecars of rewritten files are dropped like
  * ForeignShapeSpec does.
  */
object ForeignIcebergShapes {

  private val mapper = new ObjectMapper()

  private def newestMetadata(root: String): java.io.File = {
    val metaDir = new java.io.File(root, "metadata")
    metaDir.listFiles()
      .filter(_.getName.matches("v\\d+\\.metadata\\.json"))
      .maxBy(_.getName.stripPrefix("v")
        .stripSuffix(".metadata.json").toInt)
  }

  private def rewrite(f: java.io.File, content: String): Unit = {
    val w = new java.io.PrintWriter(f, "UTF-8")
    try w.print(content) finally w.close()
    new java.io.File(f.getParentFile, "." + f.getName + ".crc").delete()
  }

  /** Bump the newest metadata.json to format-version 3 in place. */
  def bumpToV3(root: String): Unit = {
    val mdFile = newestMetadata(root)
    val md = mapper.readTree(
      new String(java.nio.file.Files.readAllBytes(mdFile.toPath),
        "UTF-8")).deepCopy[ObjectNode]()
    md.put("format-version", 3)
    rewrite(mdFile, mapper.writeValueAsString(md))
  }

  /** Add a TOP-LEVEL column with a v3 `initial-default` to the current
    * schema (no data file stores it — the read must surface the
    * default). `icebergType` is the spec type string ("long", "string",
    * …); `defaultJson` the single-value-serialized default. Bumps the
    * table to v3 (defaults are a v3 feature).
    */
  def addDefaultedColumn(root: String, name: String, icebergType: String,
      defaultJson: com.fasterxml.jackson.databind.JsonNode): Unit = {
    val mdFile = newestMetadata(root)
    val md = mapper.readTree(
      new String(java.nio.file.Files.readAllBytes(mdFile.toPath),
        "UTF-8")).deepCopy[ObjectNode]()
    md.put("format-version", 3)
    val cur = md.get("schemas").elements().asScala
      .find(_.get("schema-id").asInt() ==
        md.get("current-schema-id").asInt()).get
      .asInstanceOf[ObjectNode]
    val id = md.get("last-column-id").asInt() + 1
    val f = cur.withArray("fields").addObject()
    f.put("id", id).put("name", name).put("required", false)
      .put("type", icebergType)
    f.set[ObjectNode]("initial-default", defaultJson)
    md.put("last-column-id", id)
    rewrite(mdFile, mapper.writeValueAsString(md))
  }

  /** Add a named REF (tag or branch) pointing at `snapshotId` — the
    * metadata a foreign writer's `CREATE TAG`/`CREATE BRANCH`
    * publishes in the spec's `refs` table-metadata map.
    */
  def addRef(root: String, name: String, snapshotId: Long,
      refType: String = "tag"): Unit = {
    val mdFile = newestMetadata(root)
    val md = mapper.readTree(
      new String(java.nio.file.Files.readAllBytes(mdFile.toPath),
        "UTF-8")).deepCopy[ObjectNode]()
    val refs = Option(md.get("refs")).collect {
      case o: ObjectNode => o
    }.getOrElse(md.putObject("refs"))
    refs.putObject(name).put("snapshot-id", snapshotId)
      .put("type", refType)
    rewrite(mdFile, mapper.writeValueAsString(md))
  }

  /** Add a NESTED struct child with a v3 `initial-default` to the
    * current schema: `parentCol` must be an existing struct column (no
    * data file stores the child — the read must surface the default
    * inside every non-null struct). Bumps the table to v3.
    */
  def addNestedDefaultedColumn(root: String, parentCol: String,
      name: String, icebergType: String,
      defaultJson: com.fasterxml.jackson.databind.JsonNode): Unit = {
    val mdFile = newestMetadata(root)
    val md = mapper.readTree(
      new String(java.nio.file.Files.readAllBytes(mdFile.toPath),
        "UTF-8")).deepCopy[ObjectNode]()
    md.put("format-version", 3)
    val cur = md.get("schemas").elements().asScala
      .find(_.get("schema-id").asInt() ==
        md.get("current-schema-id").asInt()).get
      .asInstanceOf[ObjectNode]
    val parent = cur.withArray("fields").elements().asScala
      .find(_.get("name").asText() == parentCol)
      .getOrElse(throw new IllegalArgumentException(
        s"no column '$parentCol' in the current schema"))
      .get("type")
    require(parent.isObject && parent.get("type").asText() == "struct",
      s"column '$parentCol' is not a struct")
    val id = md.get("last-column-id").asInt() + 1
    val f = parent.asInstanceOf[ObjectNode].withArray("fields")
      .addObject()
    f.put("id", id).put("name", name).put("required", false)
      .put("type", icebergType)
    f.set[ObjectNode]("initial-default", defaultJson)
    md.put("last-column-id", id)
    rewrite(mdFile, mapper.writeValueAsString(md))
  }

  /** Rewrite the single partition-spec field: `transform` over
    * `sourceCol`'s field id — the metadata a foreign writer partitioned
    * by bucket[N]/truncate[W]/day/… publishes. The manifest partition
    * VALUES must already be that transform's results (the caller
    * derives the partition column before exportPartitioned).
    */
  def retransform(root: String, transform: String,
      sourceCol: String): Unit = {
    val mdFile = newestMetadata(root)
    val md = mapper.readTree(
      new String(java.nio.file.Files.readAllBytes(mdFile.toPath),
        "UTF-8")).deepCopy[ObjectNode]()
    val cur = md.get("schemas").elements().asScala
      .find(_.get("schema-id").asInt() ==
        md.get("current-schema-id").asInt()).get
    val srcId = cur.get("fields").elements().asScala
      .find(_.get("name").asText() == sourceCol).get.get("id").asInt()
    val spec = md.get("partition-specs").elements().asScala.next()
      .get("fields").elements().asScala.next()
      .asInstanceOf[ObjectNode]
    spec.put("transform", transform)
    spec.put("source-id", srcId)
    rewrite(mdFile, mapper.writeValueAsString(md))
  }

  private val V3DeleteEntrySchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int","field-id":0},
      |{"name":"snapshot_id","type":["null","long"],"default":null,
      | "field-id":1},
      |{"name":"sequence_number","type":["null","long"],"default":null,
      | "field-id":3},
      |{"name":"file_sequence_number","type":["null","long"],
      | "default":null,"field-id":4},
      |{"name":"data_file","field-id":2,"type":
      | {"type":"record","name":"r2","fields":[
      |  {"name":"content","type":"int","field-id":134},
      |  {"name":"file_path","type":"string","field-id":100},
      |  {"name":"file_format","type":"string","field-id":101},
      |  {"name":"partition","field-id":102,"type":
      |   {"type":"record","name":"r102","fields":[]}},
      |  {"name":"record_count","type":"long","field-id":103},
      |  {"name":"file_size_in_bytes","type":"long","field-id":104},
      |  {"name":"referenced_data_file","type":["null","string"],
      |   "default":null,"field-id":143},
      |  {"name":"content_offset","type":["null","long"],
      |   "default":null,"field-id":144},
      |  {"name":"content_size_in_bytes","type":["null","long"],
      |   "default":null,"field-id":145}
      |]}}]}""".stripMargin)

  /** Convert the rows matching `pred` into a v3 PUFFIN DELETION VECTOR
    * snapshot: one puffin file holding one `deletion-vector-v1` blob
    * per affected data file (BE framed length, bitmap magic + portable
    * 64-bit roaring, BE CRC-32 — the Delta-compatible layout the v3
    * spec mandates), one content=1 delete manifest whose entries carry
    * `referenced_data_file`/`content_offset`/`content_size_in_bytes`,
    * spliced into the CURRENT manifest list; format-version bumped
    * to 3.
    */
  def forgeV3Dv(spark: SparkSession, root: String, pred: Column): Unit = {
    val metaDir = new java.io.File(root, "metadata")
    val mdFile = newestMetadata(root)
    val md = mapper.readTree(
      new String(java.nio.file.Files.readAllBytes(mdFile.toPath),
        "UTF-8")).deepCopy[ObjectNode]()
    val sn = md.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() ==
        md.get("current-snapshot-id").asLong()).get
    val listFile = new java.io.File(sn.get("manifest-list").asText())
    val lr = new DataFileReader[GenericRecord](listFile,
      new GenericDatumReader[GenericRecord]())
    val listSchema = lr.getSchema
    val listRecs = lr.iterator().asScala.toVector
    lr.close()
    val dataMfs = listRecs.filter(r =>
      r.get("content").asInstanceOf[Int] == 0)
    val filePaths: Seq[String] = dataMfs.flatMap { mf =>
      val r = new DataFileReader[GenericRecord](
        new java.io.File(mf.get("manifest_path").toString),
        new GenericDatumReader[GenericRecord]())
      val ps = r.iterator().asScala.map(
        _.get("data_file").asInstanceOf[GenericRecord]
          .get("file_path").toString).toVector
      r.close(); ps
    }
    val byName = filePaths.map(p =>
      new org.apache.hadoop.fs.Path(p).getName -> p).toMap
    val posByPath: Map[String, Array[Long]] = spark.read
      .parquet(filePaths: _*).filter(pred)
      .select(col("_metadata.file_name"), col("_metadata.row_index"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (nm, rs) => byName(nm) -> rs.map(_.getLong(1)).sorted }
    require(posByPath.nonEmpty, "forgeV3Dv matched no rows")

    // puffin: magic, then one framed blob per file, then a token footer
    val puffin = new java.io.File(metaDir, "forged-dv.puffin")
    val out = new java.io.ByteArrayOutputStream()
    val magic = Array[Byte]('P', 'F', 'A', '1')
    out.write(magic)
    val blobAt: Map[String, (Long, Long)] = posByPath.toSeq.sortBy(_._1)
      .map { case (p, poss) =>
        val off = out.size().toLong
        val bmp = RoaringBitmap64(poss.toSeq).serialize()
        val frame = java.nio.ByteBuffer.allocate(4 + bmp.length + 4)
        frame.putInt(bmp.length)
        frame.put(bmp)
        val crc = new java.util.zip.CRC32(); crc.update(bmp)
        frame.putInt(crc.getValue.toInt)
        out.write(frame.array())
        p -> ((off, (4 + bmp.length + 4).toLong))
      }.toMap
    out.write(magic); out.write("{}".getBytes("UTF-8"))
    val fo = new java.io.FileOutputStream(puffin)
    try fo.write(out.toByteArray) finally fo.close()

    // content=1 manifest with the v3 DV reference fields
    val seq = md.get("last-sequence-number").asLong()
    val dvManifest = new java.io.File(metaDir, "forged-dv-m1.avro")
    val mw = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](V3DeleteEntrySchema))
    mw.create(V3DeleteEntrySchema, dvManifest)
    posByPath.toSeq.sortBy(_._1).foreach { case (p, poss) =>
      val e = new GenericData.Record(V3DeleteEntrySchema)
      e.put("status", 1); e.put("snapshot_id", seq)
      e.put("sequence_number", seq); e.put("file_sequence_number", seq)
      val dfr = new GenericData.Record(
        V3DeleteEntrySchema.getField("data_file").schema())
      dfr.put("content", 1)
      dfr.put("file_path", puffin.getAbsolutePath)
      dfr.put("file_format", "PUFFIN")
      dfr.put("partition", new GenericData.Record(
        dfr.getSchema.getField("partition").schema()))
      dfr.put("record_count", poss.length.toLong)
      dfr.put("file_size_in_bytes", puffin.length())
      dfr.put("referenced_data_file", p)
      dfr.put("content_offset", blobAt(p)._1)
      dfr.put("content_size_in_bytes", blobAt(p)._2)
      e.put("data_file", dfr)
      mw.append(e)
    }
    mw.close()

    val rec = new GenericData.Record(listSchema)
    listSchema.getFields.asScala.foreach(f =>
      rec.put(f.name(), dataMfs.head.get(f.name())))
    rec.put("manifest_path", dvManifest.getAbsolutePath)
    rec.put("manifest_length", dvManifest.length())
    rec.put("content", 1)
    rec.put("added_files_count", posByPath.size)
    rec.put("existing_files_count", 0)
    rec.put("added_rows_count",
      posByPath.valuesIterator.map(_.length.toLong).sum)
    rec.put("existing_rows_count", 0L)
    require(listFile.delete(), s"cannot rewrite $listFile")
    val lw = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](listSchema))
    lw.create(listSchema, listFile)
    (listRecs :+ rec).foreach(lw.append)
    lw.close()
    new java.io.File(metaDir, "." + listFile.getName + ".crc").delete()

    md.put("format-version", 3)
    rewrite(mdFile, mapper.writeValueAsString(md))
  }
}
