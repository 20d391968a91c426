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

  test("the native reader refuses protocols, partitioning, and DVs it " +
      "does not implement — by name, never misreading") {
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
        """"readerFeatures":["deletionVectors"]}}""", meta))
    val e1 = intercept[IllegalArgumentException] {
      DeltaExport.read(spark, p3)
    }
    assert(e1.getMessage.contains("protocol 1 only"))

    val part = freshLog(Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      meta.replace(""""partitionColumns":[]""",
        """"partitionColumns":["dt"]""")))
    val e2 = intercept[IllegalArgumentException] {
      DeltaExport.read(spark, part)
    }
    assert(e2.getMessage.contains("partitioned"))

    val dv = freshLog(Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""", meta,
      """{"add":{"path":"f.parquet","size":1,"modificationTime":1,""" +
        """"dataChange":true,"partitionValues":{},""" +
        """"deletionVector":{"storageType":"u"}}}"""))
    val e3 = intercept[IllegalArgumentException] {
      DeltaExport.read(spark, dv)
    }
    assert(e3.getMessage.contains("deletion vectors"))

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
  }
}
