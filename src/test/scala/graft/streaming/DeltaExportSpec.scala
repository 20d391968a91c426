package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DeltaExportSpec extends SparkSpec {

  import spark.implicits._

  private def logFiles(root: String): Seq[String] = {
    val d = new java.io.File(root, "_delta_log")
    if (!d.exists()) Nil
    else d.listFiles().map(_.getName).filter(_.endsWith(".json")).sorted.toSeq
  }

  test("export v0 is a valid single-commit delta log; read() equals the " +
      "table; re-export is idempotent") {
    val root = java.nio.file.Files.createTempDirectory("delta").toString
    MergeInto.mergeBatch(spark,
      Seq((1L, "a", 10), (2L, "b", 20)).toDF("k", "s", "v"),
      root, "k", numBuckets = 2)
    val (v0, p0) = DeltaExport.export(spark, root)
    assert(v0 == 0L && p0.endsWith("00000000000000000000.json"))
    // one protocol, one metaData, adds for every live file, no removes
    val lines = scala.io.Source.fromFile(
      new java.io.File(new java.io.File(root, "_delta_log"),
        "00000000000000000000.json")).getLines().toSeq
    assert(lines.count(_.contains("\"protocol\"")) == 1)
    assert(lines.count(_.contains("\"metaData\"")) == 1)
    assert(lines.count(_.contains("\"add\"")) >= 1)
    assert(!lines.exists(_.contains("\"remove\"")))
    val got = DeltaExport.read(spark, root).select("k", "s", "v")
      .as[(Long, String, Int)].collect().sorted.toSeq
    assert(got == Seq((1L, "a", 10), (2L, "b", 20)))
    // idempotent: same state exports nothing new
    val (v0b, _) = DeltaExport.export(spark, root)
    assert(v0b == 0L && logFiles(root).size == 1)
  }

  test("incremental export: merge + evolution produce a diff version; " +
      "readAt time-travels; a vacuumed log fails loudly") {
    val root = java.nio.file.Files.createTempDirectory("delta").toString
    MergeInto.mergeBatch(spark,
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"), root, "k", numBuckets = 2)
    DeltaExport.export(spark, root)
    // second statement rewrites k=1's bucket and widens the schema
    MergeInto.mergeBatch(spark,
      Seq((1L, "A", 0.9)).toDF("k", "s", "score"), root, "k", numBuckets = 2)
    val (v1, _) = DeltaExport.export(spark, root)
    assert(v1 == 1L)
    val lines = scala.io.Source.fromFile(
      new java.io.File(new java.io.File(root, "_delta_log"),
        "00000000000000000001.json")).getLines().toSeq
    // schema changed -> metaData rewritten; the rewritten bucket is one
    // remove + one add; no second protocol action
    assert(lines.count(_.contains("\"metaData\"")) == 1)
    assert(lines.exists(_.contains("\"remove\"")))
    assert(lines.exists(_.contains("\"add\"")))
    assert(!lines.exists(_.contains("\"protocol\"")))
    val now = DeltaExport.read(spark, root).select("k", "s", "score")
      .as[(Long, String, Option[Double])].collect().sorted.toSeq
    assert(now == Seq((1L, "A", Some(0.9)), (2L, "b", None)))
    val asOf0 = DeltaExport.readAt(spark, root, 0L)
    assert(asOf0.columns.sorted.toSeq == Seq("__bucket", "k", "s"))
    assert(asOf0.select("k", "s").as[(Long, String)].collect().sorted.toSeq
      == Seq((1L, "a"), (2L, "b")))
    // vacuum reclaims v0-only files -> reading delta v0 must fail loudly
    ManifestStore.vacuum(spark, root)
    val e = intercept[IllegalArgumentException] {
      DeltaExport.readAt(spark, root, 0L).collect()
    }
    assert(e.getMessage.contains("missing file"))
    // latest still reads (its files survived the vacuum)
    assert(DeltaExport.read(spark, root).count() == 2)
  }

  test("the delta scan plans from the log's recorded file statuses — " +
      "manifest-fed index, exact stats, no listing") {
    val root = java.nio.file.Files.createTempDirectory("delta").toString
    MergeInto.mergeBatch(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s"),
      root, "k", numBuckets = 2)
    DeltaExport.export(spark, root)
    val df = DeltaExport.read(spark, root)
    // the scan's location is the metadata-fed index, not a listed one
    assert(df.queryExecution.executedPlan.toString
      .contains("ManifestFileIndex"),
      "delta read planned through a listing-based FileIndex")
    // optimizer stats equal the log-recorded byte sum EXACTLY (the sizes
    // Delta add actions carry exist precisely for this)
    val onDisk = df.inputFiles.map(p =>
      new java.io.File(new java.net.URI(p).getPath).length()).sum
    assert(df.queryExecution.optimizedPlan.stats.sizeInBytes == onDisk)
    // validate=false skips the existence sweep and still reads right
    val trusted = DeltaExport.readAt(spark, root, -1L, validate = false)
    assert(trusted.select("k").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L))
  }

  test("deletion vectors: a pending key-DV exports as protocol deletion " +
      "vectors (reader 3 / writer 7 + feature); the native reader " +
      "subtracts them; checkpoints and time travel keep working") {
    val root = java.nio.file.Files.createTempDirectory("delta").toString
    // 400 keys so the per-file bitmaps exceed the inline limit — this
    // test pins the SIDECAR (u) path; the inline (i) path has its own
    MergeInto.mergeBatch(spark,
      (0L until 400L).map(k => (k, s"v$k")).toDF("k", "s"),
      root, "k", numBuckets = 2)
    DeltaExport.export(spark, root) // v0, plain
    MergeInto.deleteVector(spark, root, "k",
      (0L until 400L by 3L).toDF("k"))
    // default export still refuses the pending DV
    val e0 = intercept[IllegalArgumentException] {
      DeltaExport.export(spark, root)
    }
    assert(e0.getMessage.contains("deleteVectors=true"))
    val (v1, logFile) = DeltaExport.export(spark, root, deleteVectors = true)
    assert(v1 == 1L)
    // the reader subtracts the deleted rows
    val want1 = (0L until 400L).filter(_ % 3 != 0)
    assert(DeltaExport.read(spark, root).select("k").as[Long]
      .collect().sorted.toSeq == want1)
    // re-export is idempotent on the DECODED deleted sets (descriptor
    // UUIDs are fresh per publish, so identity can't be the comparison)
    assert(DeltaExport.export(spark, root, deleteVectors = true)._1 == v1)
    // protocol + descriptor shape on disk: features on both lists, the
    // table property set, a u-storage descriptor, and the sidecar file
    val l1 = scala.io.Source.fromFile(logFile).getLines().mkString("\n")
    assert(l1.contains("\"minReaderVersion\":3"))
    assert(l1.contains("\"minWriterVersion\":7"))
    assert(l1.contains("\"readerFeatures\":[\"deletionVectors\"]"))
    assert(l1.contains("\"writerFeatures\":") &&
      l1.contains("\"deletionVectors\""))
    assert(l1.contains("\"delta.enableDeletionVectors\":\"true\""))
    assert(l1.contains("\"storageType\":\"u\""))
    // exported adds carry per-file stats (a JSON string per the spec);
    // DV'd files are tightBounds=false
    assert(l1.contains("\\\"numRecords\\\"") &&
      l1.contains("\\\"tightBounds\\\":false"))
    assert(new java.io.File(root).listFiles()
      .exists(_.getName.matches("deletion_vector_.*\\.bin")))
    // time travel BEFORE the DV version sees every row
    assert(DeltaExport.readAt(spark, root, 0L).count() == 400)
    // more deletes accumulate into a new version + checkpoint; replay
    // from the checkpoint carries the descriptors
    MergeInto.deleteVector(spark, root, "k",
      (0L until 400L by 5L).toDF("k"))
    val (v2, _) = DeltaExport.export(spark, root, deleteVectors = true,
      checkpointInterval = 2)
    assert(v2 == 2L)
    val want2 = (0L until 400L).filter(k => k % 3 != 0 && k % 5 != 0)
    val dir = new java.io.File(root, "_delta_log")
    assert(new java.io.File(dir,
      "00000000000000000002.checkpoint.parquet").exists())
    (0 to 1).foreach { v =>
      assert(new java.io.File(dir, f"$v%020d.json").delete())
    }
    assert(DeltaExport.read(spark, root).select("k").as[Long]
      .collect().sorted.toSeq == want2)
    // log expiration sweeps the sidecars expired versions referenced:
    // v1's sidecar is orphaned (v2 re-added every DV'd path with a new
    // one), the JSON below the v2 checkpoint is gone — but v2's sidecar
    // survives (its descriptors ride the checkpoint) and reads agree
    def sidecars() = new java.io.File(root).listFiles()
      .filter(_.getName.matches("deletion_vector_.*\\.bin")).map(_.getName)
    assert(sidecars().length == 2)
    val swept = DeltaExport.cleanLog(spark, root)
    assert(swept == 1, s"expected exactly the orphaned sidecar, got $swept")
    assert(sidecars().length == 1)
    assert(DeltaExport.read(spark, root).select("k").as[Long]
      .collect().sorted.toSeq == want2)
    // materializing folds the deletes into the files; the next export
    // publishes plain adds and the view is unchanged
    MergeInto.materializeDeletes(spark, root, "k")
    val (v3, _) = DeltaExport.export(spark, root)
    assert(v3 == 3L)
    assert(DeltaExport.read(spark, root).select("k").as[Long]
      .collect().sorted.toSeq == want2)
  }

  test("a SMALL deletion vector inlines into its descriptor (i storage, " +
      "base85) — no sidecar file, same subtraction, checkpoint-safe") {
    val root = java.nio.file.Files.createTempDirectory("delta").toString
    MergeInto.mergeBatch(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "s"),
      root, "k", numBuckets = 2)
    DeltaExport.export(spark, root)
    MergeInto.deleteVector(spark, root, "k", Seq(2L, 4L).toDF("k"))
    val (v1, logFile) = DeltaExport.export(spark, root,
      deleteVectors = true, checkpointInterval = 1)
    assert(v1 == 1L)
    val l1 = scala.io.Source.fromFile(logFile).getLines().mkString("\n")
    assert(l1.contains("\"storageType\":\"i\""))
    assert(!new java.io.File(root).listFiles()
      .exists(_.getName.matches("deletion_vector_.*\\.bin")))
    assert(DeltaExport.read(spark, root).select("k").as[Long]
      .collect().sorted.toSeq == Seq(1L, 3L))
    // idempotent re-export decodes the INLINE payload for comparison
    assert(DeltaExport.export(spark, root, deleteVectors = true)._1 == v1)
    // the inline descriptor rides the v1 checkpoint: replay without the
    // JSON still subtracts
    val dir = new java.io.File(root, "_delta_log")
    assert(new java.io.File(dir, "00000000000000000001.json").delete())
    assert(new java.io.File(dir, "00000000000000000000.json").delete())
    assert(DeltaExport.read(spark, root).select("k").as[Long]
      .collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("export refuses a pending deletion vector") {
    val root = java.nio.file.Files.createTempDirectory("delta").toString
    MergeInto.mergeBatch(spark,
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"), root, "k", numBuckets = 2)
    MergeInto.deleteVector(spark, root, "k", Seq(1L).toDF("k"))
    val e = intercept[IllegalArgumentException] {
      DeltaExport.export(spark, root)
    }
    assert(e.getMessage.contains("deletion vector"))
    // materializing the DV unblocks the export
    MergeInto.materializeDeletes(spark, root, "k")
    val (v, _) = DeltaExport.export(spark, root)
    assert(v == 0L)
    assert(DeltaExport.read(spark, root).select("k").as[Long]
      .collect().toSeq == Seq(2L))
  }

  test("the native reader refuses protocols, checkpoints shapes, and DVs " +
      "it does not implement — by name, never misreading") {
    def freshLog(lines: Seq[String]): String = {
      val root = java.nio.file.Files.createTempDirectory("delta").toString
      val dir = new java.io.File(root, "_delta_log")
      dir.mkdirs()
      val w = new java.io.PrintWriter(
        new java.io.File(dir, "00000000000000000000.json"), "UTF-8")
      try lines.foreach(w.println) finally w.close()
      root
    }
    val meta = """{"metaData":{"id":"x","format":{"provider":"parquet",""" +
      """"options":{}},"schemaString":"{\"type\":\"struct\",""" +
      """\"fields\":[]}","partitionColumns":[],"configuration":{}}}"""

    val p3 = freshLog(Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["typeWidening"]}}""", meta))
    val e1 = intercept[IllegalArgumentException] {
      DeltaExport.read(spark, p3)
    }
    assert(e1.getMessage.contains("typeWidening"))

    // an ABSOLUTE-path deletion vector (storageType p) on an
    // unreachable filesystem fails LOUDLY at open naming the path —
    // local absolute sidecars are a supported capability
    // (ForeignShapeSpec's shallow-clone test)
    val dv = freshLog(Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"],""" +
        """"writerFeatures":["deletionVectors"]}}""", meta,
      """{"add":{"path":"f.parquet","size":1,"modificationTime":1,""" +
        """"dataChange":true,"partitionValues":{},""" +
        """"deletionVector":{"storageType":"p","pathOrInlineDv":""" +
        """"/nonexistent-clone-src/dv.bin","sizeInBytes":40,""" +
        """"cardinality":6,"offset":1}}}"""))
    val e3 = intercept[Exception] {
      DeltaExport.read(spark, dv)
    }
    assert(e3.getMessage.contains("dv.bin") ||
      e3.getMessage.contains("nonexistent-clone-src"))

    // a version gap is refused, not silently skipped
    val gap = freshLog(Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""", meta))
    val w = new java.io.PrintWriter(new java.io.File(
      new java.io.File(gap, "_delta_log"),
      "00000000000000000002.json"), "UTF-8")
    try w.println("""{"commitInfo":{}}""") finally w.close()
    val e4 = intercept[IllegalArgumentException] {
      DeltaExport.read(spark, gap)
    }
    assert(e4.getMessage.contains("version gap"))

    // a multi-part checkpoint is refused by name — when it is the ONLY
    // way to answer (JSON cleaned below it); the hint names the reason
    val mp = freshLog(Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""", meta))
    assert(new java.io.File(new java.io.File(mp, "_delta_log"),
      "00000000000000000000.json").delete())
    val w2 = new java.io.PrintWriter(new java.io.File(
      new java.io.File(mp, "_delta_log"), "_last_checkpoint"), "UTF-8")
    try w2.println("""{"version":0,"size":3,"parts":2}""")
    finally w2.close()
    val e5 = intercept[IllegalArgumentException] {
      DeltaExport.read(spark, mp)
    }
    assert(e5.getMessage.contains("multi-part"))

    // a hint naming a checkpoint version with NO checkpoint file of any
    // supported form, again only refusable when JSON cannot answer
    val v2 = freshLog(Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""", meta))
    assert(new java.io.File(new java.io.File(v2, "_delta_log"),
      "00000000000000000000.json").delete())
    val w3 = new java.io.PrintWriter(new java.io.File(
      new java.io.File(v2, "_delta_log"), "_last_checkpoint"), "UTF-8")
    try w3.println("""{"version":0,"size":3}""") finally w3.close()
    val e6 = intercept[IllegalArgumentException] {
      DeltaExport.read(spark, v2)
    }
    assert(e6.getMessage.contains("no classic or v2 checkpoint file"))

    // …but when the JSON IS dense from 0, a foreign hint pointing at a
    // checkpoint form we lack is ADVISORY (the spec's own contract):
    // replay answers from JSON instead of refusing
    val adv = freshLog(Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""", meta))
    val w4 = new java.io.PrintWriter(new java.io.File(
      new java.io.File(adv, "_delta_log"), "_last_checkpoint"), "UTF-8")
    try w4.println("""{"version":0,"size":3,"parts":2}""")
    finally w4.close()
    val e6b = intercept[IllegalArgumentException] {
      DeltaExport.read(spark, adv)
    }
    // reaches the empty-table check — the hint did not block the replay
    assert(e6b.getMessage.contains("no live files"))

    // an absolute-URI add path (shallow-cloned file) that does NOT
    // exist fails the existence sweep loudly, naming the path — the
    // POSITIVE shallow-clone read is ForeignShapeSpec's
    val ext = freshLog(Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""", meta,
      """{"add":{"path":"file:///elsewhere/f.parquet","size":1,""" +
        """"modificationTime":1,"dataChange":true,"partitionValues":{}}}"""))
    val e7 = intercept[IllegalArgumentException] {
      DeltaExport.read(spark, ext)
    }
    assert(e7.getMessage.contains("missing file"))
    assert(e7.getMessage.contains("/elsewhere/f.parquet"))
  }

  test("action paths are percent-encoded per RFC 2396 and decoded on " +
      "read; sloppy unencoded paths fall back verbatim") {
    assert(DeltaExport.encodePath("a b/c%d e.parquet") ==
      "a%20b/c%25d%20e.parquet")
    assert(DeltaExport.decodePath("a%20b/c%25d%20e.parquet") ==
      "a b/c%d e.parquet")
    assert(DeltaExport.decodePath("data/part-0.parquet") ==
      "data/part-0.parquet")
    // a raw space is not a valid URI reference — taken verbatim
    assert(DeltaExport.decodePath("a b.parquet") == "a b.parquet")
    // round-trip for every path shape our writers produce
    val rel = "data_v3/__seg=2/part-00000-abc.snappy.parquet"
    assert(DeltaExport.decodePath(DeltaExport.encodePath(rel)) == rel)
  }

  test("reads a foreign PARTITIONED delta log: partition columns " +
      "reconstructed from partitionValues, typed, pruned from metadata") {
    val root = java.nio.file.Files.createTempDirectory("delta").toString
    val df = Seq((1L, "x", "a", 7), (2L, "y", "a", 7), (3L, "z", "b", 8))
      .toDF("k", "s", "dt", "p")
    // a foreign writer's layout: files under dt=/p= dirs, data files
    // do NOT store the partition columns
    df.write.partitionBy("dt", "p").parquet(s"$root/data")
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    lines += """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
    val meta = m.createObjectNode()
    val md = meta.putObject("metaData")
    md.put("id", "t").putObject("format").put("provider", "parquet")
    md.put("schemaString", df.schema.json)
    md.putArray("partitionColumns").add("dt").add("p")
    lines += m.writeValueAsString(meta)
    for {
      (dt, p) <- Seq(("a", 7), ("b", 8))
      f <- new java.io.File(s"$root/data/dt=$dt/p=$p").listFiles()
      if f.getName.endsWith(".parquet")
    } {
      val n = m.createObjectNode()
      val a = n.putObject("add")
      a.put("path", s"data/dt=$dt/p=$p/${f.getName}")
        .put("size", f.length()).put("modificationTime", f.lastModified())
        .put("dataChange", true)
      a.putObject("partitionValues").put("dt", dt).put("p", p.toString)
      lines += m.writeValueAsString(n)
    }
    val dir = new java.io.File(root, "_delta_log"); dir.mkdirs()
    val w = new java.io.PrintWriter(
      new java.io.File(dir, "00000000000000000000.json"), "UTF-8")
    try lines.foreach(w.println) finally w.close()

    val got = DeltaExport.read(spark, root)
    // declared column order restored, partition columns typed
    assert(got.columns.toSeq == Seq("k", "s", "dt", "p"))
    assert(got.schema("p").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(got.as[(Long, String, String, Int)].collect().sorted.toSeq ==
      Seq((1L, "x", "a", 7), (2L, "y", "a", 7), (3L, "z", "b", 8)))
    // metadata partition pruning: the filtered scan opens only dt=a files
    val filtered = got.filter(col("dt") === "a")
    filtered.collect()
    val exec = filtered.queryExecution.executedPlan
    val finalPlan = exec.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
    }.getOrElse(exec)
    val scan = (finalPlan.collectLeaves() :+ finalPlan).collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    assert(scan.metrics("numPartitions").value == 1,
      "expected the dt=b metadata partition pruned, scanned " +
        s"${scan.metrics("numPartitions").value} of 2")
  }

  test("export writes a classic checkpoint every interval; replay starts " +
      "from it, so cleaned pre-checkpoint versions still read") {
    val root = java.nio.file.Files.createTempDirectory("delta").toString
    MergeInto.mergeBatch(spark,
      Seq((1L, "v0"), (2L, "w")).toDF("k", "s"), root, "k", numBuckets = 2)
    DeltaExport.export(spark, root, checkpointInterval = 4)
    for (i <- 1 to 9) {
      MergeInto.mergeBatch(spark, Seq((1L, s"v$i")).toDF("k", "s"),
        root, "k", numBuckets = 2)
      DeltaExport.export(spark, root, checkpointInterval = 4)
    }
    val dir = new java.io.File(root, "_delta_log")
    assert(new java.io.File(dir,
      "00000000000000000008.checkpoint.parquet").exists())
    assert(new java.io.File(dir, "_last_checkpoint").exists())
    // a version BETWEEN two retained checkpoints answers from the OLDER
    // one even though _last_checkpoint names the newer (the hint is
    // advisory; the listed checkpoint files are the source of truth)
    (0 to 3).foreach { v =>
      assert(new java.io.File(dir, f"$v%020d.json").delete())
    }
    assert(DeltaExport.readAt(spark, root, 5L).select("s")
      .as[String].collect().sorted.toSeq == Seq("v5", "w"))
    // …and a cleaned log with NO hint file at all still reads (the spec
    // makes _last_checkpoint optional)
    val hintFile = new java.io.File(dir, "_last_checkpoint")
    val hintBytes = java.nio.file.Files.readAllBytes(hintFile.toPath)
    assert(hintFile.delete())
    assert(DeltaExport.readAt(spark, root, 5L).select("s")
      .as[String].collect().sorted.toSeq == Seq("v5", "w"))
    java.nio.file.Files.write(hintFile.toPath, hintBytes)
    // clean every remaining JSON version the newest checkpoint covers
    (4 to 7).foreach { v =>
      assert(new java.io.File(dir, f"$v%020d.json").delete())
    }
    val got = DeltaExport.read(spark, root).select("k", "s")
      .as[(Long, String)].collect().sorted.toSeq
    assert(got == Seq((1L, "v9"), (2L, "w")))
    // time travel to the checkpoint version itself needs zero JSON replay
    assert(DeltaExport.readAt(spark, root, 8L).select("s")
      .as[String].collect().sorted.toSeq == Seq("v8", "w"))
    // …but a version BELOW the checkpoint whose JSON was cleaned is an
    // honest refusal, not a wrong answer
    val e = intercept[IllegalArgumentException] {
      DeltaExport.readAt(spark, root, 3L)
    }
    assert(e.getMessage.contains("no usable checkpoint"))
    // idempotent export still recognises the unchanged state via the
    // checkpointed replay
    val (v, _) = DeltaExport.export(spark, root, checkpointInterval = 4)
    assert(v == 9L)
  }

  test("DATA SKIPPING from add.stats: numeric min/max prune files at " +
      "planning; string bounds (truncatable) never prune") {
    val root = java.nio.file.Files.createTempDirectory("delta").toString
    def writeFile(lo: Long): (String, Long) = {
      val stage = s"$root/stage$lo"
      (lo until lo + 10).map(k => (k, s"s$k")).toDF("k", "s")
        .coalesce(1).write.parquet(stage)
      val f = new java.io.File(stage).listFiles()
        .find(_.getName.startsWith("part-")).get
      val dst = new java.io.File(root, s"f$lo.parquet")
      java.nio.file.Files.move(f.toPath, dst.toPath)
      (dst.getName, dst.length())
    }
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    lines += """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType)))
    val meta = m.createObjectNode()
    val md = meta.putObject("metaData")
    md.put("id", "stats-fixture")
    md.putObject("format").put("provider", "parquet")
    md.put("schemaString", schema.json)
    md.putArray("partitionColumns")
    md.putObject("configuration")
    lines += m.writeValueAsString(meta)
    Seq(0L, 10L, 20L).foreach { lo =>
      val (name, size) = writeFile(lo)
      val stats = m.createObjectNode()
      stats.put("numRecords", 10L)
      stats.putObject("minValues").put("k", lo).put("s", s"s$lo")
      stats.putObject("maxValues").put("k", lo + 9).put("s", s"s${lo + 9}")
      stats.putObject("nullCount").put("k", 0L).put("s", 0L)
      val n = m.createObjectNode()
      n.putObject("add").put("path", name).put("size", size)
        .put("modificationTime", 1L).put("dataChange", true)
        .put("stats", m.writeValueAsString(stats))
        .putObject("partitionValues")
      lines += m.writeValueAsString(n)
    }
    val dir = new java.io.File(root, "_delta_log")
    require(dir.mkdirs())
    val w = new java.io.PrintWriter(
      new java.io.File(dir, "00000000000000000000.json"), "UTF-8")
    try lines.foreach(w.println) finally w.close()

    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
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

    // point predicate inside file 3's [20, 29] range: ONE file planned
    val hit = DeltaExport.read(spark, root).filter(col("k") === 25L)
    assert(hit.select("k", "s").as[(Long, String)].collect().toSeq ==
      Seq((25L, "s25")))
    assert(scannedFiles(hit) == 1L, "k=25 must plan exactly one file")
    // range predicate spanning two files
    val range = DeltaExport.read(spark, root).filter(col("k") >= 15L)
    assert(range.count() == 15L)
    assert(scannedFiles(range) == 2L, "k>=15 must plan two files")
    // a string predicate must NOT prune (foreign writers truncate long
    // string bounds — pruning on them can be wrong, so we never do)
    val str = DeltaExport.read(spark, root).filter(col("s") === "zzz")
    assert(str.count() == 0L)
    assert(scannedFiles(str) == 3L, "string stats must not prune")
  }

  test("reads a MULTI-PART classic checkpoint (foreign writers split " +
      "large checkpoints); an incomplete part set refuses by name") {
    val root = java.nio.file.Files.createTempDirectory("delta").toString
    MergeInto.mergeBatch(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s"),
      root, "k", numBuckets = 2)
    DeltaExport.export(spark, root, checkpointInterval = 100)
    MergeInto.mergeBatch(spark, Seq((1L, "A")).toDF("k", "s"),
      root, "k", numBuckets = 2)
    DeltaExport.export(spark, root, checkpointInterval = 100)
    MergeInto.mergeBatch(spark, Seq((4L, "d")).toDF("k", "s"),
      root, "k", numBuckets = 2)
    val (v2, _) = DeltaExport.export(spark, root, checkpointInterval = 2)
    assert(v2 == 2L) // interval 2 wrote a single-part checkpoint at v2
    val dir = new java.io.File(root, "_delta_log")
    val single = new java.io.File(dir,
      "00000000000000000002.checkpoint.parquet")
    assert(single.exists())
    // split it into a 2-part checkpoint exactly as a foreign writer
    // names them: <v>.checkpoint.<i>.<n>.parquet, i = 1..n
    val cp = spark.read.parquet(single.toString)
    val rows = cp.collect().toSeq
    val schema = cp.schema
    Seq(rows.take(2), rows.drop(2)).zipWithIndex.foreach { case (part, i) =>
      val tmp = java.nio.file.Files.createTempDirectory("cppart").toString
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(part).asJava), schema)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val pf = new java.io.File(tmp).listFiles()
        .find(_.getName.startsWith("part-")).get
      val name = f"00000000000000000002.checkpoint.${i + 1}%010d.${2}%010d.parquet"
      java.nio.file.Files.move(pf.toPath,
        new java.io.File(dir, name).toPath)
    }
    assert(single.delete())
    (0 to 1).foreach { v =>
      assert(new java.io.File(dir, f"$v%020d.json").delete())
    }
    // the original hint was written through Hadoop's checksummed local
    // fs — drop the stale .crc sidecar before rewriting it directly
    new java.io.File(dir, "._last_checkpoint.crc").delete()
    val hint = new java.io.PrintWriter(
      new java.io.File(dir, "_last_checkpoint"), "UTF-8")
    try hint.println("""{"version":2,"parts":2}""") finally hint.close()
    // replay starts from the 2-part checkpoint: full state reconstructs
    assert(DeltaExport.read(spark, root).select("k", "s")
      .as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "A"), (2L, "b"), (3L, "c"), (4L, "d")))
    assert(DeltaExport.readAt(spark, root, 2L).count() == 4)
    // an INCOMPLETE part set must not plan a partial table: with part 2
    // of 2 gone and the pre-checkpoint JSON expired, refuse by name
    assert(new java.io.File(dir,
      f"00000000000000000002.checkpoint.${2}%010d.${2}%010d.parquet").delete())
    val e = intercept[IllegalArgumentException] {
      DeltaExport.read(spark, root)
    }
    assert(e.getMessage.contains("missing or incomplete"))
  }

  test("exportPartitioned publishes a PARTITIONED delta table the native " +
      "reader (and pruning) round-trips — incl. escaped and null values") {
    val root = java.nio.file.Files.createTempDirectory("delta").toString + "/t"
    val df = Seq(
      (1L, "x", Some("a")), (2L, "y", Some("a")),
      (3L, "z", Some("b=c")), // '=' must Hive-escape in the dir name
      (4L, "w", None)         // null partition value
    ).toDF("k", "s", "dt")
    val (v, _) = DeltaExport.exportPartitioned(spark, df, root, Seq("dt"))
    assert(v == 0L)
    val got = DeltaExport.read(spark, root)
    assert(got.columns.toSeq == Seq("k", "s", "dt"))
    assert(got.as[(Long, String, Option[String])].collect().sorted.toSeq ==
      Seq((1L, "x", Some("a")), (2L, "y", Some("a")),
        (3L, "z", Some("b=c")), (4L, "w", None)))
    // the log's add actions carry partitionValues (incl. a JSON null)
    val lines = scala.io.Source.fromFile(new java.io.File(
      new java.io.File(root, "_delta_log"),
      "00000000000000000000.json")).getLines().toSeq
    assert(lines.exists(_.contains(""""partitionValues":{"dt":"b=c"}""")))
    assert(lines.exists(_.contains(""""partitionValues":{"dt":null}""")))
    // pruning on the escaped value returns exactly its row
    assert(DeltaExport.read(spark, root).filter(col("dt") === "b=c")
      .select("k").as[Long].collect().toSeq == Seq(3L))
    // a second publish at the same root refuses loudly
    val e = intercept[IllegalArgumentException] {
      DeltaExport.exportPartitioned(spark, df, root, Seq("dt"))
    }
    assert(e.getMessage.contains("already exists"))
  }

  test("reads a COLUMN-MAPPED (name mode, protocol 2) table: physical " +
      "file/partition names resolved to logical columns; id/nested refused") {
    import org.apache.spark.sql.types._
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    def mapped(name: String, phys: String, dt: String): StructField =
      StructField(name, DataType.fromDDL(dt).asInstanceOf[DataType],
        nullable = true, new MetadataBuilder()
          .putLong("delta.columnMapping.id", 1L)
          .putString("delta.columnMapping.physicalName", phys).build())

    // physical layout: files under phys-dt= dirs storing (col-aaa, col-bbb)
    val root = java.nio.file.Files.createTempDirectory("delta").toString
    val physDf = Seq((1L, "x", "a"), (2L, "y", "b"))
      .toDF("col-aaa", "col-bbb", "phys-dt")
    physDf.write.partitionBy("phys-dt").parquet(s"$root/data")
    val logical = StructType(Seq(
      mapped("k", "col-aaa", "BIGINT"), mapped("s", "col-bbb", "STRING"),
      mapped("dt", "phys-dt", "STRING")))

    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    lines += """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}"""
    val meta = m.createObjectNode()
    val md = meta.putObject("metaData")
    md.put("id", "t").putObject("format").put("provider", "parquet")
    md.put("schemaString", logical.json)
    md.putArray("partitionColumns").add("dt")
    md.putObject("configuration").put("delta.columnMapping.mode", "name")
    lines += m.writeValueAsString(meta)
    for {
      dt <- Seq("a", "b")
      f <- new java.io.File(s"$root/data/phys-dt=$dt").listFiles()
      if f.getName.endsWith(".parquet")
    } {
      val n = m.createObjectNode()
      val a = n.putObject("add")
      a.put("path", s"data/phys-dt=$dt/${f.getName}")
        .put("size", f.length()).put("modificationTime", f.lastModified())
        .put("dataChange", true)
      // partitionValues keyed by the PHYSICAL name, per the spec
      a.putObject("partitionValues").put("phys-dt", dt)
      lines += m.writeValueAsString(n)
    }
    val dir = new java.io.File(root, "_delta_log"); dir.mkdirs()
    val w = new java.io.PrintWriter(
      new java.io.File(dir, "00000000000000000000.json"), "UTF-8")
    try lines.foreach(w.println) finally w.close()

    val got = DeltaExport.read(spark, root)
    assert(got.columns.toSeq == Seq("k", "s", "dt"))
    assert(got.as[(Long, String, String)].collect().sorted.toSeq ==
      Seq((1L, "x", "a"), (2L, "y", "b")))
    // a LOGICAL-name filter still prunes the physical metadata partition
    assert(got.filter(col("dt") === "b").select("k")
      .as[Long].collect().toSeq == Seq(2L))

    // an UNKNOWN mapping mode is refused by name
    val idRoot = java.nio.file.Files.createTempDirectory("delta").toString
    val idDir = new java.io.File(idRoot, "_delta_log"); idDir.mkdirs()
    val w2 = new java.io.PrintWriter(
      new java.io.File(idDir, "00000000000000000000.json"), "UTF-8")
    try {
      w2.println(
        """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""")
      val meta2 = m.createObjectNode()
      val md2 = meta2.putObject("metaData")
      md2.put("id", "t").putObject("format").put("provider", "parquet")
      md2.put("schemaString", logical.json)
      md2.putArray("partitionColumns")
      md2.putObject("configuration")
        .put("delta.columnMapping.mode", "fancy")
      w2.println(m.writeValueAsString(meta2))
      w2.println("""{"add":{"path":"f.parquet","size":1,""" +
        """"modificationTime":1,"dataChange":true,"partitionValues":{}}}""")
    } finally w2.close()
    val e1 = intercept[IllegalArgumentException] {
      DeltaExport.read(spark, idRoot)
    }
    assert(e1.getMessage.contains("'fancy'"))

    // an id-mode field WITHOUT a recorded columnMapping.id is refused
    // by name, never matched by guess
    val noId = StructType(Seq(
      StructField("k", LongType, nullable = true, new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", "col-k").build())))
    val niRoot = java.nio.file.Files.createTempDirectory("delta").toString
    val niDir = new java.io.File(niRoot, "_delta_log"); niDir.mkdirs()
    val w3 = new java.io.PrintWriter(
      new java.io.File(niDir, "00000000000000000000.json"), "UTF-8")
    try {
      w3.println(
        """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""")
      val meta3 = m.createObjectNode()
      val md3 = meta3.putObject("metaData")
      md3.put("id", "t").putObject("format").put("provider", "parquet")
      md3.put("schemaString", noId.json)
      md3.putArray("partitionColumns")
      md3.putObject("configuration").put("delta.columnMapping.mode", "id")
      w3.println(m.writeValueAsString(meta3))
      w3.println("""{"add":{"path":"f.parquet","size":1,""" +
        """"modificationTime":1,"dataChange":true,"partitionValues":{}}}""")
    } finally w3.close()
    val e2 = intercept[IllegalArgumentException] {
      DeltaExport.read(spark, niRoot)
    }
    assert(e2.getMessage.contains("delta.columnMapping.id"))
  }

  test("reads a NESTED column-mapped table (name mode): physical names " +
      "rewritten recursively, renamed back to logical") {
    import org.apache.spark.sql.types._
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    // physical layout: col-aaa BIGINT, col-obj STRUCT<col-xxx INT,
    // col-yyy STRING>
    val root = java.nio.file.Files.createTempDirectory("delta").toString
    spark.sql("SELECT * FROM VALUES " +
        "(1L, named_struct('col-xxx', 10, 'col-yyy', 'p'))," +
        "(2L, named_struct('col-xxx', 20, 'col-yyy', 'q')) " +
        "AS t(`col-aaa`, `col-obj`)")
      .write.parquet(s"$root/data")
    def metaOf(phys: String) = new MetadataBuilder()
      .putString("delta.columnMapping.physicalName", phys).build()
    val logical = StructType(Seq(
      StructField("k", LongType, nullable = true, metaOf("col-aaa")),
      StructField("o", StructType(Seq(
        StructField("x", IntegerType, nullable = true, metaOf("col-xxx")),
        StructField("y", StringType, nullable = true, metaOf("col-yyy")))),
        nullable = true, metaOf("col-obj"))))
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    lines += """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}"""
    val meta = m.createObjectNode()
    val md = meta.putObject("metaData")
    md.put("id", "t").putObject("format").put("provider", "parquet")
    md.put("schemaString", logical.json)
    md.putArray("partitionColumns")
    md.putObject("configuration").put("delta.columnMapping.mode", "name")
    lines += m.writeValueAsString(meta)
    for {
      f <- new java.io.File(s"$root/data").listFiles().sortBy(_.getName)
      if f.getName.endsWith(".parquet")
    } {
      val n = m.createObjectNode()
      val a = n.putObject("add")
      a.put("path", s"data/${f.getName}")
        .put("size", f.length()).put("modificationTime", f.lastModified())
        .put("dataChange", true)
      a.putObject("partitionValues")
      lines += m.writeValueAsString(n)
    }
    val dir = new java.io.File(root, "_delta_log"); dir.mkdirs()
    val w = new java.io.PrintWriter(
      new java.io.File(dir, "00000000000000000000.json"), "UTF-8")
    try lines.foreach(w.println) finally w.close()

    val got = DeltaExport.read(spark, root)
    assert(got.columns.toSeq == Seq("k", "o"))
    assert(got.schema("o").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("x", "y"))
    assert(got.select(col("k"), col("o.x"), col("o.y"))
      .as[(Long, Int, String)].collect().sorted.toSeq ==
      Seq((1L, 10, "p"), (2L, 20, "q")))
  }

  test("reads an ID-mode column-mapped table: columns matched by " +
      "parquet field id, not by name") {
    import org.apache.spark.sql.types._
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = java.nio.file.Files.createTempDirectory("delta").toString
    // the FILE stores ids 7 (long) and 3 (string) under names that match
    // NOTHING in the logical/physical schema — only the ids can resolve
    // them (the exact situation after a foreign id-mode rename)
    val fileSchema = StructType(Seq(
      StructField("old-name-1", LongType, nullable = true,
        new MetadataBuilder().putLong("parquet.field.id", 7L).build()),
      StructField("old-name-2", StringType, nullable = true,
        new MetadataBuilder().putLong("parquet.field.id", 3L).build())))
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(1L, "x"),
        org.apache.spark.sql.Row(2L, "y")), fileSchema)
      .repartition(1).write.parquet(s"$root/data")
    def idMeta(phys: String, id: Long) = new MetadataBuilder()
      .putString("delta.columnMapping.physicalName", phys)
      .putLong("delta.columnMapping.id", id).build()
    val logical = StructType(Seq(
      StructField("k", LongType, nullable = true, idMeta("col-k", 7L)),
      StructField("s", StringType, nullable = true, idMeta("col-s", 3L))))
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    lines += """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}"""
    val meta = m.createObjectNode()
    val md = meta.putObject("metaData")
    md.put("id", "t").putObject("format").put("provider", "parquet")
    md.put("schemaString", logical.json)
    md.putArray("partitionColumns")
    md.putObject("configuration").put("delta.columnMapping.mode", "id")
    lines += m.writeValueAsString(meta)
    for {
      f <- new java.io.File(s"$root/data").listFiles().sortBy(_.getName)
      if f.getName.endsWith(".parquet")
    } {
      val n = m.createObjectNode()
      val a = n.putObject("add")
      a.put("path", s"data/${f.getName}")
        .put("size", f.length()).put("modificationTime", f.lastModified())
        .put("dataChange", true)
      a.putObject("partitionValues")
      lines += m.writeValueAsString(n)
    }
    val dir = new java.io.File(root, "_delta_log"); dir.mkdirs()
    val w = new java.io.PrintWriter(
      new java.io.File(dir, "00000000000000000000.json"), "UTF-8")
    try lines.foreach(w.println) finally w.close()

    val got = DeltaExport.read(spark, root)
    assert(got.columns.toSeq == Seq("k", "s"))
    assert(got.as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "x"), (2L, "y")))
  }

  test("publishIdMapped WRITES an id-mode table: files carry parquet " +
      "field ids (nested too), logical names resolve by ID even after " +
      "a forged physical-name swap, and an existing log refuses") {
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = java.nio.file.Files.createTempDirectory("delta").toString
    val df = Seq((1L, "a", "x", ("p", 10)), (2L, "b", "y", ("q", 20)))
      .toDF("k", "s1", "s2", "info")
    DeltaExport.publishIdMapped(spark, df, root)
    // the log publishes id mode + maxColumnId; schemaString carries an
    // id and a synthetic physical name on every field
    val log = scala.io.Source.fromFile(new java.io.File(
      new java.io.File(root, "_delta_log"),
      "00000000000000000000.json")).mkString
    assert(log.contains("\"delta.columnMapping.mode\":\"id\""))
    assert(log.contains("delta.columnMapping.maxColumnId"))
    // the written parquet footers carry field ids at EVERY level
    val part = new java.io.File(s"$root/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(part.toString),
      spark.sparkContext.hadoopConfiguration)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    val msg = try r.getFooter.getFileMetaData.getSchema finally r.close()
    assert(msg.getFields.asScala.forall(_.getId != null),
      "every top-level parquet field must carry an id")
    val infoGroup = msg.getFields.asScala
      .find(!_.isPrimitive).get.asGroupType()
    assert(infoGroup.getFields.asScala.forall(_.getId != null),
      "nested struct fields must carry ids too")
    // physical column names are synthetic — no logical name in the file
    assert(msg.getFields.asScala.forall(_.getName.startsWith("col_")))
    // read back under logical names, values intact (struct included)
    val got = DeltaExport.read(spark, root)
    assert(got.columns.toSeq == Seq("k", "s1", "s2", "info"))
    assert(got.select("k", "s1", "s2", "info._1", "info._2")
      .as[(Long, String, String, String, Int)].collect().sorted.toSeq ==
      Seq((1L, "a", "x", "p", 10), (2L, "b", "y", "q", 20)))
    // FORGE: swap the two same-typed fields' physicalNames in the
    // schemaString (foreign id-mode physical names are arbitrary and
    // uncorrelated) — a name-matching reader would swap s1/s2 values;
    // id resolution must still return them correctly
    val logFile = new java.io.File(new java.io.File(root, "_delta_log"),
      "00000000000000000000.json")
    val swapped = scala.io.Source.fromFile(logFile).getLines().map {
      line =>
        if (!line.contains("metaData")) line
        else {
          val node = m.readTree(line)
            .deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
          val mdn = node.get("metaData")
            .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          val schema = DataType.fromJson(
            mdn.get("schemaString").asText()).asInstanceOf[StructType]
          def physOf(n: String) = schema(n).metadata
            .getString("delta.columnMapping.physicalName")
          val (p1, p2) = (physOf("s1"), physOf("s2"))
          val newSchema = StructType(schema.fields.map { f =>
            val np = f.name match {
              case "s1" => p2
              case "s2" => p1
              case _ => f.metadata
                .getString("delta.columnMapping.physicalName")
            }
            f.copy(metadata = new MetadataBuilder()
              .withMetadata(f.metadata)
              .putString("delta.columnMapping.physicalName", np).build())
          })
          mdn.put("schemaString", newSchema.json)
          m.writeValueAsString(node)
        }
    }.toVector
    val w = new java.io.PrintWriter(logFile, "UTF-8")
    try swapped.foreach(w.println) finally w.close()
    new java.io.File(logFile.getParentFile,
      "." + logFile.getName + ".crc").delete()
    val got2 = DeltaExport.read(spark, root)
      .select("k", "s1", "s2").as[(Long, String, String)]
      .collect().sorted.toSeq
    assert(got2 == Seq((1L, "a", "x"), (2L, "b", "y")),
      "id resolution must survive uncorrelated physical names")
    // one-shot surface: an existing log refuses loudly
    val e = intercept[IllegalArgumentException] {
      DeltaExport.publishIdMapped(spark, df, root)
    }
    assert(e.getMessage.contains("already exists"))
  }

  test("METADATA TABLES: files/history/detail answer from the log " +
      "alone and agree with the table's accounting; unknown kinds " +
      "refuse by name") {
    val root = java.nio.file.Files.createTempDirectory("delta").toString
    MergeInto.mergeBatch(spark,
      (0L until 100L).map(k => (k, s"v$k")).toDF("k", "s"),
      root, "k", numBuckets = 2)
    DeltaExport.export(spark, root)
    MergeInto.deleteVector(spark, root, "k", Seq(7L, 14L).toDF("k"))
    DeltaExport.export(spark, root, deleteVectors = true)
    def meta(kind: String) = DeltaExport.metaTable(spark, root, kind)
    // files: stats account for every physical row, DVs for the deletes
    val files = meta("files")
      .agg(sum(col("num_records")), sum(col("dv_cardinality")))
      .as[(Long, Long)].head()
    assert(files == ((100L, 2L)))
    // history: two commits, ascending versions
    assert(meta("history").select("version").as[Long].collect().toSeq
      .sorted == Seq(0L, 1L))
    // detail: one row, protocol versions reflect the DV upgrade
    val det = meta("detail").select("num_files", "min_reader_version",
      "min_writer_version", "column_mapping_mode")
      .as[(Long, Int, Int, String)].head()
    assert(det._2 == 3 && det._3 == 7 && det._4 == "none")
    assert(det._1 == meta("files").count())
    val e = intercept[IllegalArgumentException] {
      DeltaExport.metaTable(spark, root, "partitions")
    }
    assert(e.getMessage.contains("unknown delta metadata table"))
  }

  test("history, timestamp time travel, and cleanLog round out the " +
      "consumer surface") {
    val root = java.nio.file.Files.createTempDirectory("delta").toString
    MergeInto.mergeBatch(spark,
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"), root, "k", numBuckets = 2)
    DeltaExport.export(spark, root, checkpointInterval = 3)
    for (i <- 1 to 5) {
      MergeInto.mergeBatch(spark, Seq((1L, s"v$i")).toDF("k", "s"),
        root, "k", numBuckets = 2)
      DeltaExport.export(spark, root, checkpointInterval = 3)
    }
    // history: newest first; every version has a timestamp and counts
    val h = DeltaExport.history(spark, root)
    assert(h.map(_.version) == (5L to 0L by -1L))
    assert(h.forall(_.timestamp > 0L))
    assert(h.last.operation == "WRITE" && h.head.operation == "MERGE")
    assert(h.last.numRemoves == 0 && h.head.numAdds >= 1)
    assert(h.map(_.timestamp).reverse == h.map(_.timestamp).reverse.sorted)

    // timestamp travel: the commit time of v2 resolves to exactly v2
    val t2 = h.find(_.version == 2L).get.timestamp
    assert(DeltaExport.readAtTimestamp(spark, root, t2).select("s")
      .as[String].collect().sorted.toSeq ==
      DeltaExport.readAt(spark, root, 2L).select("s")
        .as[String].collect().sorted.toSeq)
    // …and a timestamp before v0 refuses loudly
    val e = intercept[IllegalArgumentException] {
      DeltaExport.readAtTimestamp(spark, root, h.last.timestamp - 1)
    }
    assert(e.getMessage.contains("predates"))

    // cleanLog: drops everything below the last checkpoint (v3), keeps
    // the table readable at HEAD and at the checkpoint, refuses below
    val removed = DeltaExport.cleanLog(spark, root)
    assert(removed == 3, s"expected JSONs 0..2 removed, got $removed")
    assert(DeltaExport.read(spark, root).count() == 2)
    assert(DeltaExport.readAt(spark, root, 3L).count() == 2)
    intercept[IllegalArgumentException] {
      DeltaExport.readAt(spark, root, 1L)
    }
    // history now reports only the retained tail
    assert(DeltaExport.history(spark, root).map(_.version) ==
      (5L to 3L by -1L))
    // a second clean is a no-op
    assert(DeltaExport.cleanLog(spark, root) == 0)
  }

  test("CHECK constraints export as delta.constraints.* configuration " +
      "+ the checkConstraints writer feature; an add/drop with no file " +
      "change still publishes a metaData action") {
    val root = java.nio.file.Files.createTempDirectory("delta").toString
    MergeInto.mergeBatch(spark,
      Seq((1L, 10), (2L, 25)).toDF("k", "v"), root, "k", numBuckets = 2)
    MergeInto.addCheckConstraint(spark, root, "v_pos", "v > 0")
    val (v0, logFile) = DeltaExport.export(spark, root)
    val l0 = scala.io.Source.fromFile(logFile).getLines().mkString("\n")
    assert(l0.contains("\"delta.constraints.v_pos\":\"v > 0\""))
    assert(l0.contains("\"minWriterVersion\":3"))
    // idempotent while nothing changed
    assert(DeltaExport.export(spark, root)._1 == v0)
    // DROPPING the check changes no file — the export must still
    // publish a fresh metaData without the constraint (a foreign writer
    // would otherwise keep enforcing a dropped invariant)
    MergeInto.dropCheckConstraint(spark, root, "v_pos")
    val (v1, log1) = DeltaExport.export(spark, root)
    assert(v1 == v0 + 1)
    assert(!scala.io.Source.fromFile(log1).getLines().mkString("\n")
      .contains("delta.constraints"))
    assert(DeltaExport.read(spark, root).count() == 2)
  }

  test("STORED generated columns export per the protocol: values in " +
      "the files, delta.generationExpression in the schemaString, the " +
      "generatedColumns writer feature declared; VIRTUAL ones still " +
      "refuse with the materialize hint; the Iceberg twin exports too") {
    val root = java.nio.file.Files.createTempDirectory("delta").toString
    MergeInto.mergeBatch(spark,
      Seq((1L, 10), (2L, 25)).toDF("k", "v"), root, "k", numBuckets = 2)
    MergeInto.addGeneratedColumn(spark, root, "band", "v div 10")
    val eVirt = intercept[IllegalArgumentException] {
      DeltaExport.export(spark, root)
    }
    assert(eVirt.getMessage.contains("materializeGeneratedColumn"))
    MergeInto.materializeGeneratedColumn(spark, root, "band")
    val (v0, logFile) = DeltaExport.export(spark, root)
    assert(v0 == 0L)
    val l0 = scala.io.Source.fromFile(logFile).getLines().mkString("\n")
    assert(l0.contains("delta.generationExpression"))
    assert(l0.contains("v div 10"))
    assert(l0.contains("\"minWriterVersion\":4"))
    // the native reader returns the stored values; the expression
    // lives in the log's schemaString field metadata (the protocol
    // surface — readers consume values, WRITERS consume the expression)
    val got = DeltaExport.read(spark, root)
    assert(got.select("k", "band").as[(Long, Long)].collect().toMap ==
      Map(1L -> 1L, 2L -> 2L))
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val schemaStr = scala.io.Source.fromFile(logFile).getLines()
      .map(om.readTree).find(_.has("metaData")).get
      .get("metaData").get("schemaString").asText()
    val st = org.apache.spark.sql.types.DataType.fromJson(schemaStr)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(st("band").metadata
      .getString("delta.generationExpression") == "v div 10")
    // a merge recomputes and the next export ships the fresh values
    MergeInto.mergeBatch(spark, Seq((2L, 47)).toDF("k", "v"),
      root, "k", numBuckets = 2)
    DeltaExport.export(spark, root)
    assert(DeltaExport.read(spark, root).select("k", "band")
      .as[(Long, Long)].collect().toMap == Map(1L -> 1L, 2L -> 4L))
    // the Iceberg twin: stored values export as a plain column, the
    // expression rides as a namespaced table property
    val (_, mdPath) = IcebergExport.export(spark, root)
    assert(IcebergExport.read(spark, root).select("k", "band")
      .as[(Long, Long)].collect().toMap == Map(1L -> 1L, 2L -> 4L))
    assert(scala.io.Source.fromFile(mdPath).mkString
      .contains("graft.generationExpression.band"))
  }

  test("a RENAMED table exports as a NAME-MODE COLUMN-MAPPED delta log " +
      "(logical schemaString over untouched physical files); generated " +
      "columns and the colmap+CDF combination refuse") {
    val root = java.nio.file.Files.createTempDirectory("delta").toString
    MergeInto.mergeBatch(spark,
      Seq((1L, "a", 10), (2L, "b", 20)).toDF("k", "s", "v"),
      root, "k", numBuckets = 2)
    MergeInto.renameColumn(spark, root, "s", "label")
    val (v0, logFile) = DeltaExport.export(spark, root)
    assert(v0 == 0L)
    val l0 = scala.io.Source.fromFile(logFile).getLines().mkString("\n")
    assert(l0.contains("\"delta.columnMapping.mode\":\"name\""))
    assert(l0.contains("\"minReaderVersion\":2"))
    assert(l0.contains(
      "\\\"delta.columnMapping.physicalName\\\":\\\"s\\\""))
    // the native reader resolves the LOGICAL names over physical files
    val got = DeltaExport.read(spark, root)
    assert(got.columns.contains("label") && !got.columns.contains("s"))
    assert(got.select("k", "label", "v").as[(Long, String, Int)]
      .collect().sorted.toSeq == Seq((1L, "a", 10), (2L, "b", 20)))
    // re-export is idempotent (deterministic mapped schema)
    assert(DeltaExport.export(spark, root)._1 == 0L)
    // a further rename re-publishes metaData only
    MergeInto.renameColumn(spark, root, "v", "value")
    val (v1, _) = DeltaExport.export(spark, root)
    assert(v1 == 1L)
    assert(DeltaExport.read(spark, root).columns.toSet
      .intersect(Set("label", "value")) == Set("label", "value"))
    // colmap + CDF is SPEC-LEGAL (cdc files use physical names exactly
    // like data files): a further merge exports with a change feed, the
    // cdc file stores the PHYSICAL columns, and table_changes maps them
    // back to the post-rename logical schema
    MergeInto.mergeBatch(spark,
      Seq((2L, "B", 21)).toDF("k", "label", "value"),
      root, "k", numBuckets = 2)
    val (v2, _) = DeltaExport.export(spark, root,
      changeDataKey = Some("k"))
    assert(v2 == 2L)
    val ch = DeltaExport.readChanges(spark, root, 2L, 2L)
    assert(ch.columns.contains("label") && ch.columns.contains("value")
      && !ch.columns.contains("s"))
    assert(ch.select("k", "label", "value", "_change_type")
      .as[(Long, String, Int, String)].collect().toSet ==
      Set((2L, "b", 20, "update_preimage"),
        (2L, "B", 21, "update_postimage")))
    assert(ch.select("_commit_version").as[Long].collect().toSet ==
      Set(2L))
    // the cdc FILE itself stores the physical column names
    val cdcFile = new java.io.File(root, "_change_data").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val cdcCols = spark.read.parquet(cdcFile.toString).columns.toSet
    assert(cdcCols.contains("s") && cdcCols.contains("v") &&
      !cdcCols.contains("label"))
    // column-mapping ids are IMMUTABLE across exports: the id physical
    // 's' carried in v0's schemaString is the id it still carries in
    // v1's (written after the SECOND rename re-published metaData)
    def idOfPhys(v: Long, phys: String): Long = {
      val txt = scala.io.Source.fromFile(new java.io.File(
        new java.io.File(root, "_delta_log"),
        f"$v%020d.json")).getLines().mkString("\n")
      val re = ("""\\"delta\.columnMapping\.id\\":(\d+),""" +
        """\\"delta\.columnMapping\.physicalName\\":\\"""" +
        phys + """\\"""").r
      val re2 = ("""\\"delta\.columnMapping\.physicalName\\":\\"""" +
        phys +
        """\\",\\"delta\.columnMapping\.id\\":(\d+)""").r
      re.findFirstMatchIn(txt).orElse(re2.findFirstMatchIn(txt))
        .map(_.group(1).toLong).getOrElse(
          fail(s"no colmap id for '$phys' in version $v"))
    }
    assert(idOfPhys(1L, "s") == idOfPhys(0L, "s"))
    assert(idOfPhys(1L, "v") == idOfPhys(0L, "v"))
    // a GENERATED column refuses the export by name
    val root2 = java.nio.file.Files.createTempDirectory("delta").toString
    MergeInto.mergeBatch(spark,
      Seq((1L, 10)).toDF("k", "v"), root2, "k", numBuckets = 2)
    MergeInto.addGeneratedColumn(spark, root2, "v2", "v * 2")
    val e2 = intercept[IllegalArgumentException] {
      DeltaExport.export(spark, root2)
    }
    assert(e2.getMessage.contains("VIRTUAL generated"))
  }

  test("v2 checkpoints round-trip: UUID-named top + sidecar actions, " +
      "protocol feature declared, replay from the v2 checkpoint after " +
      "cleanLog, expired sidecars swept") {
    val root = java.nio.file.Files.createTempDirectory("delta").toString
    MergeInto.mergeBatch(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s"),
      root, "k", numBuckets = 2)
    DeltaExport.export(spark, root, checkpointInterval = 2,
      v2Checkpoints = true)
    for (i <- 1 to 5) {
      MergeInto.mergeBatch(spark, Seq((1L, s"v$i")).toDF("k", "s"),
        root, "k", numBuckets = 2)
      DeltaExport.export(spark, root, checkpointInterval = 2,
        v2Checkpoints = true)
    }
    val dir = new java.io.File(root, "_delta_log")
    // UUID-named tops at the interval versions, NO classic file
    val tops = dir.listFiles().map(_.getName)
      .filter(_.matches("""\d{20}\.checkpoint\.[0-9a-f-]{36}\.parquet"""))
      .sorted.toSeq
    assert(tops.map(_.take(20).toLong) == Seq(2L, 4L))
    assert(!dir.listFiles().map(_.getName)
      .exists(_.matches("""\d{20}\.checkpoint\.parquet""")))
    // one sidecar parquet per checkpoint, under _delta_log/_sidecars
    val scDir = new java.io.File(dir, "_sidecars")
    assert(scDir.listFiles().count(_.getName.endsWith(".parquet")) == 2)
    // the protocol declares the v2Checkpoint feature on BOTH lists
    val v0 = scala.io.Source.fromFile(
      new java.io.File(dir, "00000000000000000000.json"))
      .getLines().mkString("\n")
    assert(v0.contains("\"minReaderVersion\":3"))
    assert(v0.contains("\"v2Checkpoint\""))
    // full state reads back at HEAD and at the checkpoint version
    assert(DeltaExport.read(spark, root).select("s").as[String]
      .collect().sorted.toSeq == Seq("b", "c", "v5"))
    assert(DeltaExport.readAt(spark, root, 4L).select("s").as[String]
      .collect().sorted.toSeq == Seq("b", "c", "v4"))
    // expire the prefix: replay must come from the v2 checkpoint alone
    val removed = DeltaExport.cleanLog(spark, root)
    assert(removed >= 4) // JSONs 0..3 + the expired v2 top + its sidecar
    assert(!new java.io.File(dir, "00000000000000000000.json").exists())
    assert(dir.listFiles().map(_.getName)
      .count(_.matches("""\d{20}\.checkpoint\.[0-9a-f-]{36}\.parquet"""))
      == 1)
    // the expired checkpoint's sidecar was swept, the live one kept
    assert(scDir.listFiles().count(_.getName.endsWith(".parquet")) == 1)
    assert(DeltaExport.read(spark, root).select("s").as[String]
      .collect().sorted.toSeq == Seq("b", "c", "v5"))
    assert(DeltaExport.readAt(spark, root, 4L).count() == 3)
    intercept[IllegalArgumentException] {
      DeltaExport.readAt(spark, root, 1L)
    }
    // the txn high-water mark survives log expiration via the checkpoint
    assert(DeltaExport.lastTxn(spark, root,
      DeltaExport.manifestAppId(root)).nonEmpty)
  }

  test("foreign v2 checkpoint corners: JSON-format top with inline adds " +
      "reads; a missing sidecar and a version-mismatched top refuse") {
    import org.apache.spark.sql.types._
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    def freshTable(): (String, java.io.File, String) = {
      val root = java.nio.file.Files.createTempDirectory("delta").toString
      Seq((1L, "x"), (2L, "y")).toDF("k", "s")
        .repartition(1).write.parquet(s"$root/data")
      val dir = new java.io.File(root, "_delta_log"); dir.mkdirs()
      val dataFile = new java.io.File(s"$root/data").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      (root, dir, s"data/${dataFile.getName}")
    }
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("s", StringType)))
    def cpLines(root: String, rel: String,
        withAdd: Boolean): Seq[String] = {
      val f = new java.io.File(root, rel)
      val proto = """{"protocol":{"minReaderVersion":3,""" +
        """"minWriterVersion":7,"readerFeatures":["v2Checkpoint"],""" +
        """"writerFeatures":["v2Checkpoint"]}}"""
      val meta = m.createObjectNode()
      val md = meta.putObject("metaData")
      md.put("id", "t").putObject("format").put("provider", "parquet")
      md.put("schemaString", schema.json)
      md.putArray("partitionColumns")
      md.putObject("configuration")
      val add = m.createObjectNode()
      val a = add.putObject("add")
      a.put("path", rel).put("size", f.length())
        .put("modificationTime", f.lastModified()).put("dataChange", true)
      a.putObject("partitionValues")
      Seq("""{"checkpointMetadata":{"version":0}}""", proto,
        m.writeValueAsString(meta)) ++
        (if (withAdd) Seq(m.writeValueAsString(add)) else Nil)
    }
    def write(f: java.io.File, lines: Seq[String]): Unit = {
      val w = new java.io.PrintWriter(f, "UTF-8")
      try lines.foreach(w.println) finally w.close()
    }

    // JSON-format v2 top carrying its adds INLINE (no sidecar), with
    // only the hint pointing at it — the un-listed-JSON replay shape
    val (r1, d1, rel1) = freshTable()
    write(new java.io.File(d1,
      "00000000000000000000.checkpoint.11111111-2222-3333-4444-555555555555.json"),
      cpLines(r1, rel1, withAdd = true))
    write(new java.io.File(d1, "_last_checkpoint"),
      Seq("""{"version":0,"size":4}"""))
    assert(DeltaExport.read(spark, r1).as[(Long, String)]
      .collect().sorted.toSeq == Seq((1L, "x"), (2L, "y")))

    // a sidecar action naming a file that is not there refuses by name
    val (r2, d2, rel2) = freshTable()
    write(new java.io.File(d2,
      "00000000000000000000.checkpoint.11111111-2222-3333-4444-555555555555.json"),
      cpLines(r2, rel2, withAdd = false) :+
        """{"sidecar":{"path":"gone.parquet","sizeInBytes":10}}""")
    write(new java.io.File(d2, "_last_checkpoint"),
      Seq("""{"version":0,"size":4}"""))
    val e1 = intercept[IllegalArgumentException] {
      DeltaExport.read(spark, r2)
    }
    assert(e1.getMessage.contains("gone.parquet"))

    // a top whose checkpointMetadata.version disagrees with its file
    // name refuses as corrupt
    val (r3, d3, rel3) = freshTable()
    write(new java.io.File(d3,
      "00000000000000000001.checkpoint.11111111-2222-3333-4444-555555555555.json"),
      cpLines(r3, rel3, withAdd = true)) // declares version 0, named 1
    write(new java.io.File(d3, "00000000000000000001.json"),
      Seq("""{"commitInfo":{}}"""))
    write(new java.io.File(d3, "_last_checkpoint"),
      Seq("""{"version":1,"size":4}"""))
    val e2 = intercept[IllegalArgumentException] {
      DeltaExport.read(spark, r3)
    }
    assert(e2.getMessage.contains("corrupt checkpoint"))
  }
}
