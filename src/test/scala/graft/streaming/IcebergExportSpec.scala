package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IcebergExportSpec extends SparkSpec {

  import spark.implicits._

  private def metaFiles(root: String): Seq[String] = {
    val d = new java.io.File(root, "metadata")
    if (!d.exists()) Nil else d.listFiles().map(_.getName).sorted.toSeq
  }

  test("export publishes a spec-shaped v2 iceberg table; read() equals " +
      "the table; re-export is idempotent") {
    val root = java.nio.file.Files.createTempDirectory("iceberg").toString
    MergeInto.mergeBatch(spark,
      Seq((1L, "a", 10), (2L, "b", 20)).toDF("k", "s", "v"),
      root, "k", numBuckets = 2)
    val (sid, mdPath) = IcebergExport.export(spark, root)
    assert(sid == 1L && mdPath.endsWith("v1.metadata.json"))
    val names = metaFiles(root)
    assert(names.contains("v1.metadata.json"))
    assert(names.contains("version-hint.text"))
    assert(names.exists(_.matches("snap-1-1-.*\\.avro")))
    assert(names.exists(_.endsWith("-m0.avro")))
    // the metadata carries the spec's required v2 surface
    val md = scala.io.Source.fromFile(
      new java.io.File(new java.io.File(root, "metadata"),
        "v1.metadata.json")).mkString
    assert(md.contains("\"format-version\" : 2"))
    assert(md.contains("\"schema.name-mapping.default\""))
    assert(md.contains("\"current-snapshot-id\" : 1"))
    assert(md.contains("\"last-sequence-number\" : 1"))
    // the manifest avro embeds spec field-ids in its schema
    val manifest = new java.io.File(new java.io.File(root, "metadata"),
      names.find(_.endsWith("-m0.avro")).get)
    val raw = java.nio.file.Files.readAllBytes(manifest.toPath)
    val head = new String(raw.take(4096), "ISO-8859-1")
    assert(head.contains("\"field-id\":100") &&
      head.contains("\"field-id\":103"))
    // read back equals the table
    val got = IcebergExport.read(spark, root).select("k", "s", "v")
      .as[(Long, String, Int)].collect().sorted.toSeq
    assert(got == Seq((1L, "a", 10), (2L, "b", 20)))
    // idempotent: same manifest version exports nothing new
    val (sid2, _) = IcebergExport.export(spark, root)
    assert(sid2 == 1L)
    assert(metaFiles(root).count(_.endsWith(".metadata.json")) == 1)
  }

  test("incremental snapshots: time travel by snapshot id, stable " +
      "field ids across schema evolution, snapshot history") {
    val root = java.nio.file.Files.createTempDirectory("iceberg").toString
    MergeInto.mergeBatch(spark,
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"), root, "k", numBuckets = 2)
    IcebergExport.export(spark, root)
    // second merge widens the schema (adds `score`)
    MergeInto.mergeBatch(spark,
      Seq((1L, "A", 0.9)).toDF("k", "s", "score"), root, "k",
      numBuckets = 2)
    val (sid2, mdPath2) = IcebergExport.export(spark, root)
    assert(sid2 == 2L && mdPath2.endsWith("v2.metadata.json"))
    val now = IcebergExport.read(spark, root).select("k", "s", "score")
      .as[(Long, String, Option[Double])].collect().sorted.toSeq
    assert(now == Seq((1L, "A", Some(0.9)), (2L, "b", None)))
    // snapshot 1 still reads the pre-evolution state under its schema
    val asOf1 = IcebergExport.readAt(spark, root, 1L)
    assert(asOf1.columns.sorted.toSeq == Seq("__bucket", "k", "s"))
    assert(asOf1.select("k", "s").as[(Long, String)].collect()
      .sorted.toSeq == Seq((1L, "a"), (2L, "b")))
    // history: two snapshots, ascending; the FIRST export appends,
    // the bucket-rewriting merge overwrites (the spec's operation
    // classes — foreign incremental consumers branch on them)
    val snaps = IcebergExport.snapshots(spark, root)
    assert(snaps.map(_.snapshotId) == Seq(1L, 2L))
    assert(snaps.map(_.operation) == Seq("append", "overwrite"))
    // field-id stability: column k keeps its id across the two schemas
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val md = m.readTree(scala.io.Source.fromFile(
      new java.io.File(new java.io.File(root, "metadata"),
        "v2.metadata.json")).mkString)
    import scala.jdk.CollectionConverters._
    val schemas = md.get("schemas").elements().asScala.toSeq
    assert(schemas.size == 2)
    def idOf(s: com.fasterxml.jackson.databind.JsonNode,
        name: String): Int =
      s.get("fields").elements().asScala
        .find(_.get("name").asText() == name).get.get("id").asInt()
    assert(idOf(schemas(0), "k") == idOf(schemas(1), "k"))
    assert(idOf(schemas(0), "s") == idOf(schemas(1), "s"))
    // the new column got a FRESH id above the previous last-column-id
    val kId = idOf(schemas(1), "k")
    val sId = idOf(schemas(1), "s")
    assert(idOf(schemas(1), "score") > math.max(kId, sId))
    assert(md.get("last-column-id").asInt() >= idOf(schemas(1), "score"))
    // both metadata versions retained; the log links them
    assert(md.get("metadata-log").size() == 1)
    assert(md.get("snapshot-log").size() == 2)
  }

  test("pending deletes publish as POSITION DELETE FILES (reserved " +
      "field ids, delete manifest); the reader subtracts them; time " +
      "travel and accumulation keep working") {
    val root = java.nio.file.Files.createTempDirectory("iceberg").toString
    MergeInto.mergeBatch(spark,
      (0L until 400L).map(k => (k, s"v$k")).toDF("k", "s"),
      root, "k", numBuckets = 2)
    IcebergExport.export(spark, root) // snapshot 1, plain
    MergeInto.deleteVector(spark, root, "k",
      (0L until 400L by 3L).toDF("k"))
    // default export still refuses the pending DV
    val e0 = intercept[IllegalArgumentException] {
      IcebergExport.export(spark, root)
    }
    assert(e0.getMessage.contains("deleteFiles=true"))
    val (s2, _) = IcebergExport.export(spark, root, deleteFiles = true)
    assert(s2 == 2L)
    val want1 = (0L until 400L).filter(_ % 3 != 0)
    assert(IcebergExport.read(spark, root).select("k").as[Long]
      .collect().sorted.toSeq == want1)
    // the spec artifacts exist: a -deletes.parquet, a delete manifest,
    // and the manifest list carries BOTH manifests
    val names = metaFiles(root)
    assert(names.exists(_.endsWith("-deletes.parquet")))
    assert(names.exists(_.endsWith("-m1.avro")))
    // the delete parquet carries the spec's reserved field ids and is
    // sorted (file_path, pos)
    val delFile = new java.io.File(new java.io.File(root, "metadata"),
      names.find(_.endsWith("-deletes.parquet")).get)
    val del = spark.read.parquet(delFile.toString)
    assert(del.columns.toSeq == Seq("file_path", "pos"))
    assert(del.count() == (0L until 400L by 3L).size.toLong)
    // re-export with nothing new is idempotent
    assert(IcebergExport.export(spark, root, deleteFiles = true)._1 == 2L)
    // snapshot 1 (pre-delete) still reads every row
    assert(IcebergExport.readAt(spark, root, 1L).count() == 400)
    // deletes ACCUMULATE into the next snapshot
    MergeInto.deleteVector(spark, root, "k",
      (0L until 400L by 5L).toDF("k"))
    val (s3, _) = IcebergExport.export(spark, root, deleteFiles = true)
    assert(s3 == 3L)
    val want2 = (0L until 400L).filter(k => k % 3 != 0 && k % 5 != 0)
    assert(IcebergExport.read(spark, root).select("k").as[Long]
      .collect().sorted.toSeq == want2)
    // the intermediate merge-on-read snapshot is still travelable
    assert(IcebergExport.readAt(spark, root, 2L).count() ==
      want1.size.toLong)
  }

  test("exportPartitioned publishes an identity-partitioned table: " +
      "columns kept in the files, typed partition tuples in the " +
      "manifest, pruning from manifest values alone") {
    val root = java.nio.file.Files.createTempDirectory("iceberg").toString
    val df = Seq((1L, "x", "a", 7), (2L, "y", "a", 7), (3L, "z", "b", 8))
      .toDF("k", "s", "dt", "p")
    val (sid, _) = IcebergExport.exportPartitioned(
      spark, df, root, Seq("dt", "p"))
    assert(sid == 1L)
    // the metadata declares a real identity spec with source ids
    val md = scala.io.Source.fromFile(
      new java.io.File(new java.io.File(root, "metadata"),
        "v1.metadata.json")).mkString
    assert(md.contains("\"transform\" : \"identity\""))
    assert(md.contains("\"last-partition-id\" : 1001"))
    // read back: every column is real (stored in the files), values right
    val got = IcebergExport.read(spark, root)
    assert(got.columns.toSeq == Seq("k", "s", "dt", "p"))
    assert(got.as[(Long, String, String, Int)].collect().sorted.toSeq ==
      Seq((1L, "x", "a", 7), (2L, "y", "a", 7), (3L, "z", "b", 8)))
    // manifest-value pruning: the dt='b' filter scans only that
    // partition's file(s) — planned from the manifests, no listing
    val filtered = got.filter(col("dt") === "b")
    filtered.collect()
    def scanOf(df: org.apache.spark.sql.DataFrame) = {
      val exec = df.queryExecution.executedPlan
      val finalPlan = exec.collectFirst {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => a.executedPlan
      }.getOrElse(exec)
      (finalPlan.collectLeaves() :+ finalPlan).collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.get
    }
    val totalFiles = got.inputFiles.length
    assert(totalFiles >= 2, "fixture should span >= 2 files")
    val scanned = scanOf(filtered).metrics("numFiles").value
    assert(scanned < totalFiles,
      s"expected the dt=a files pruned from manifest values, scanned " +
        s"$scanned of $totalFiles")
    assert(filtered.as[(Long, String, String, Int)].collect().toSeq ==
      Seq((3L, "z", "b", 8)))
    // an integer partition predicate prunes too
    val fp = IcebergExport.read(spark, root).filter(col("p") === 8)
    fp.collect()
    assert(scanOf(fp).metrics("numFiles").value < totalFiles)
    // a second publish at the same root refuses loudly
    val e = intercept[IllegalArgumentException] {
      IcebergExport.exportPartitioned(spark, df, root, Seq("dt"))
    }
    assert(e.getMessage.contains("already exists"))
  }

  test("publish records manifest column bounds (spec binary form); the " +
      "reader data-skips from them; carried files keep stats across " +
      "incremental exports") {
    val root = java.nio.file.Files.createTempDirectory("iceberg").toString
    // 4 id-range files via publish
    val df = (0L until 400L).map(k => (k, s"s$k")).toDF("id", "s")
    IcebergExport.publish(spark, df.repartitionByRange(4, col("id")), root)
    val got = IcebergExport.read(spark, root)
    assert(got.count() == 400)
    val totalFiles = got.inputFiles.length
    assert(totalFiles == 4)
    // an id range predicate prunes to the matching file(s)
    val f = IcebergExport.read(spark, root).filter(col("id") < 50L)
    f.collect()
    val exec = f.queryExecution.executedPlan
    val finalPlan = exec.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.executedPlan
    }.getOrElse(exec)
    val scan = (finalPlan.collectLeaves() :+ finalPlan).collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    assert(scan.metrics("numFiles").value == 1,
      s"expected 1 of 4 range files from manifest bounds, scanned " +
        s"${scan.metrics("numFiles").value}")
    assert(f.select("id").as[Long].collect().sorted.toSeq ==
      (0L until 50L))

    // incremental export CARRIES stats for untouched files: merge table
    // route, two exports, second manifest still has bounds for files
    // that did not change
    val root2 = java.nio.file.Files.createTempDirectory("iceberg").toString
    MergeInto.mergeBatch(spark,
      (0L until 100L).map(k => (k, s"v$k")).toDF("k", "s"),
      root2, "k", numBuckets = 4)
    IcebergExport.export(spark, root2)
    MergeInto.mergeBatch(spark, Seq((1L, "X")).toDF("k", "s"),
      root2, "k", numBuckets = 4) // rewrites ONE bucket
    IcebergExport.export(spark, root2)
    val mdDir = new java.io.File(root2, "metadata")
    import scala.jdk.CollectionConverters._
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val md = m.readTree(scala.io.Source.fromFile(
      new java.io.File(mdDir, "v2.metadata.json")).mkString)
    val sn2 = md.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() == 2L).get
    val in = new java.io.FileInputStream(
      sn2.get("manifest-list").asText())
    val lst = new org.apache.avro.file.DataFileStream(in,
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val mPath = lst.iterator().asScala.toSeq.head
      .get("manifest_path").toString
    lst.close(); in.close()
    val in2 = new java.io.FileInputStream(mPath)
    val ms = new org.apache.avro.file.DataFileStream(in2,
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val dfs = ms.iterator().asScala.toSeq.map(
      _.get("data_file").asInstanceOf[
        org.apache.avro.generic.GenericRecord])
    ms.close(); in2.close()
    assert(dfs.size == 4)
    assert(dfs.forall(_.get("lower_bounds") != null),
      "every entry (carried AND fresh) must keep its bounds")
    // and the bounds actually skip: k > 99 matches nothing, zero files
    val none = IcebergExport.read(spark, root2).filter(col("k") > 99L)
    assert(none.count() == 0)
    val exec2 = none.queryExecution.executedPlan
    val fp2 = exec2.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.executedPlan
    }.getOrElse(exec2)
    val scan2 = (fp2.collectLeaves() :+ fp2).collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    assert(scan2.metrics("numFiles").value == 0)
  }

  test("snapshot expiration keeps the tail readable, refuses expired " +
      "ids, deletes only orphaned metadata files; timestamp travel " +
      "resolves from the snapshot log") {
    val root = java.nio.file.Files.createTempDirectory("iceberg").toString
    MergeInto.mergeBatch(spark,
      Seq((1L, "v0"), (2L, "w")).toDF("k", "s"), root, "k", numBuckets = 2)
    IcebergExport.export(spark, root)
    for (i <- 1 to 4) {
      MergeInto.mergeBatch(spark, Seq((1L, s"v$i")).toDF("k", "s"),
        root, "k", numBuckets = 2)
      IcebergExport.export(spark, root)
    }
    assert(IcebergExport.snapshots(spark, root).map(_.snapshotId) ==
      (1L to 5L))
    // timestamp travel: snapshot 2's commit time resolves to exactly 2
    val t2 = IcebergExport.snapshots(spark, root)
      .find(_.snapshotId == 2L).get.timestampMs
    assert(IcebergExport.readAtTimestamp(spark, root, t2).select("s")
      .as[String].collect().sorted.toSeq ==
      IcebergExport.readAt(spark, root, 2L).select("s")
        .as[String].collect().sorted.toSeq)
    intercept[IllegalArgumentException] {
      IcebergExport.readAtTimestamp(spark, root,
        IcebergExport.snapshots(spark, root).head.timestampMs - 1)
    }
    // expire all but the last two
    val removed = IcebergExport.expireSnapshots(spark, root, keepLast = 2)
    assert(removed >= 3, s"expected >=3 metadata files deleted, got " +
      s"$removed") // 3 manifest lists at minimum
    assert(IcebergExport.snapshots(spark, root).map(_.snapshotId) ==
      Seq(4L, 5L))
    assert(IcebergExport.read(spark, root).select("s").as[String]
      .collect().sorted.toSeq == Seq("v4", "w"))
    assert(IcebergExport.readAt(spark, root, 4L).count() == 2)
    val e = intercept[IllegalArgumentException] {
      IcebergExport.readAt(spark, root, 1L)
    }
    assert(e.getMessage.contains("expired"))
    // a fresh export continues the sequence after expiration
    MergeInto.mergeBatch(spark, Seq((1L, "v5")).toDF("k", "s"),
      root, "k", numBuckets = 2)
    val (s6, _) = IcebergExport.export(spark, root)
    assert(s6 == 6L)
    assert(IcebergExport.read(spark, root).select("s").as[String]
      .collect().sorted.toSeq == Seq("v5", "w"))
    // expiring with nothing to expire is a no-op
    assert(IcebergExport.expireSnapshots(spark, root,
      keepLast = 10) == 0)
  }

  test("pending deletes publish as EQUALITY delete files (the Flink-CDC " +
      "shape): keys only, no table scan, strictly-older-sequence " +
      "application; new-file snapshots refuse the mode") {
    val root = java.nio.file.Files.createTempDirectory("iceberg").toString
    MergeInto.mergeBatch(spark,
      (0L until 100L).map(k => (k, s"v$k")).toDF("k", "s"),
      root, "k", numBuckets = 2)
    // equality mode on the FIRST export refuses: every file is new in
    // this snapshot, and the strictly-older rule would miss them all
    MergeInto.deleteVector(spark, root, "k", Seq(0L).toDF("k"))
    val e0 = intercept[IllegalArgumentException] {
      IcebergExport.export(spark, root, deleteFiles = true,
        equalityDeletes = true)
    }
    assert(e0.getMessage.contains("position deletes instead"))
    // position-mode export unblocks (v1 carries the delete immediately)
    IcebergExport.export(spark, root, deleteFiles = true)
    assert(IcebergExport.read(spark, root).count() == 99)
    // now the files are carried: further deletes ship as equality files
    MergeInto.deleteVector(spark, root, "k",
      (0L until 100L by 3L).toDF("k"))
    val (s2, _) = IcebergExport.export(spark, root, deleteFiles = true,
      equalityDeletes = true)
    assert(s2 == 2L)
    val want = (0L until 100L).filter(k => k != 0 && k % 3 != 0)
    assert(IcebergExport.read(spark, root).select("k").as[Long]
      .collect().sorted.toSeq == want)
    // time travel to the position-delete snapshot is unaffected
    assert(IcebergExport.readAt(spark, root, 1L).count() == 99)
    // the delete file is the KEY LIST itself (one column, the key)
    val names = metaFiles(root)
    val delFiles = names.filter(_.endsWith("-deletes.parquet"))
    val eqFile = delFiles.map(n => new java.io.File(
      new java.io.File(root, "metadata"), n))
      .map(f => spark.read.parquet(f.toString))
      .find(_.columns.toSeq == Seq("k")).get
    assert(eqFile.as[Long].collect().sorted.toSeq ==
      (0L until 100L by 3L))
    // the summary names the mode
    val md = scala.io.Source.fromFile(new java.io.File(
      new java.io.File(root, "metadata"), "v2.metadata.json")).mkString
    assert(md.contains("added-equality-deletes"))
    // deletes accumulate across further equality exports
    MergeInto.deleteVector(spark, root, "k",
      (0L until 100L by 5L).toDF("k"))
    IcebergExport.export(spark, root, deleteFiles = true,
      equalityDeletes = true)
    val want2 = (0L until 100L)
      .filter(k => k != 0 && k % 3 != 0 && k % 5 != 0)
    assert(IcebergExport.read(spark, root).select("k").as[Long]
      .collect().sorted.toSeq == want2)
  }

  test("UniForm shape: one committed table exports BOTH Delta and " +
      "Iceberg from the same snapshots; the two native readers agree " +
      "at head and across time travel") {
    val root = java.nio.file.Files.createTempDirectory("uniform").toString
    def both(): Unit = {
      DeltaExport.export(spark, root)
      IcebergExport.export(spark, root)
    }
    MergeInto.mergeBatch(spark,
      Seq((1L, "a", 10), (2L, "b", 20)).toDF("k", "s", "v"),
      root, "k", numBuckets = 2)
    both() // delta v0 == iceberg snapshot 1
    MergeInto.mergeBatch(spark,
      Seq((1L, "A", 11), (3L, "c", 30)).toDF("k", "s", "v"),
      root, "k", numBuckets = 2)
    both() // delta v1 == iceberg snapshot 2
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, Int)] =
      df.select("k", "s", "v").as[(Long, String, Int)]
        .collect().sorted.toSeq
    assert(rows(DeltaExport.read(spark, root)) ==
      rows(IcebergExport.read(spark, root)))
    assert(rows(DeltaExport.readAt(spark, root, 0L)) ==
      rows(IcebergExport.readAt(spark, root, 1L)))
    assert(rows(IcebergExport.read(spark, root)) ==
      Seq((1L, "A", 11), (2L, "b", 20), (3L, "c", 30)))
    // the two logs live side by side under the table root
    assert(new java.io.File(root, "_delta_log").exists())
    assert(new java.io.File(root, "metadata").exists())
  }

  test("bucket layout survives the interop round trip: same-bucketed " +
      "tables read through the DELTA and ICEBERG paths join with ZERO " +
      "shuffle; a stripped stamp falls back, never a wrong partitioning") {
    def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      "ShuffleQueryStage".r
        .findAllIn(df.queryExecution.executedPlan.toString).size
    }
    val a = java.nio.file.Files.createTempDirectory("ib").toString + "/a"
    val b = java.nio.file.Files.createTempDirectory("ib").toString + "/b"
    MergeInto.mergeBatch(spark,
      (0L until 1000L).map(i => (i, s"s$i")).toDF("k", "s"),
      a, "k", numBuckets = 8)
    MergeInto.mergeBatch(spark,
      (0L until 1000L by 3L).map(i => (i, i * 2)).toDF("k", "v"),
      b, "k", numBuckets = 8)
    DeltaExport.export(spark, a); DeltaExport.export(spark, b)
    IcebergExport.export(spark, a); IcebergExport.export(spark, b)
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val viaDelta = DeltaExport.read(spark, a)
        .join(DeltaExport.read(spark, b).drop("__bucket"), Seq("k"))
        .select(col("k"), col("s"), col("v"))
      assert(exchanges(viaDelta) == 0,
        "same-bucketed key join through the DELTA path must not shuffle")
      val viaIce = IcebergExport.read(spark, a)
        .join(IcebergExport.read(spark, b).drop("__bucket"), Seq("k"))
        .select(col("k"), col("s"), col("v"))
      assert(exchanges(viaIce) == 0,
        "same-bucketed key join through the ICEBERG path must not shuffle")
      assert(viaDelta.count() == 334 && viaIce.count() == 334)
      // tamper: strip ONE file's bucket stamp (rename on disk + in both
      // logs would be the honest test, but the cheap sound property is
      // the fallback itself: a table property WITHOUT stamps must scan
      // plain) — simulate via a fresh unstamped table carrying the props
      val c = java.nio.file.Files.createTempDirectory("ib").toString + "/c"
      Seq((1L, "x")).toDF("k", "s").write.parquet(s"$c/data")
      val dataFile = new java.io.File(s"$c/data").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val lines = scala.collection.mutable.ArrayBuffer.empty[String]
      lines += """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
      val meta = m.createObjectNode()
      val md = meta.putObject("metaData")
      md.put("id", "t").putObject("format").put("provider", "parquet")
      md.put("schemaString", org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("s",
          org.apache.spark.sql.types.StringType))).json)
      md.putArray("partitionColumns")
      md.putObject("configuration")
        .put("graft.numBuckets", "8").put("graft.bucketKey", "k")
      lines += m.writeValueAsString(meta)
      val add = m.createObjectNode()
      val an = add.putObject("add")
      an.put("path", s"data/${dataFile.getName}")
        .put("size", dataFile.length())
        .put("modificationTime", dataFile.lastModified())
        .put("dataChange", true)
      an.putObject("partitionValues")
      lines += m.writeValueAsString(add)
      val dir = new java.io.File(c, "_delta_log"); dir.mkdirs()
      val w = new java.io.PrintWriter(
        new java.io.File(dir, "00000000000000000000.json"), "UTF-8")
      try lines.foreach(w.println) finally w.close()
      val plain = DeltaExport.read(spark, c)
      plain.collect()
      assert(!plain.queryExecution.executedPlan.toString
        .contains("Bucketed: true"),
        "unstamped files must not declare a bucketed scan")
      assert(plain.count() == 1)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("a RENAMED table exports via the spec's stable field ids: " +
      "metadata-only (no data file touched), name-mapping resolves the " +
      "files' physical columns, the field id survives the rename, and " +
      "merges after the rename keep working; GENERATED columns still " +
      "refuse by name") {
    val root = java.nio.file.Files.createTempDirectory("iceberg").toString
    MergeInto.mergeBatch(spark,
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"), root, "k", numBuckets = 2)
    IcebergExport.export(spark, root)
    def dataFiles(): Map[String, Long] = {
      def walk(d: java.io.File): Seq[java.io.File] =
        Option(d.listFiles()).toSeq.flatten.flatMap(f =>
          if (f.isDirectory && f.getName != "metadata") walk(f)
          else if (f.getName.endsWith(".parquet")) Seq(f) else Nil)
      walk(new java.io.File(root))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val before = dataFiles()
    MergeInto.renameColumn(spark, root, "s", "label")
    val (s2, m2) = IcebergExport.export(spark, root)
    assert(s2 == 2L)
    assert(dataFiles() == before,
      "rename export must be metadata-only — no data file touched")
    // read-back under the POST-RENAME logical names, values intact
    val got = IcebergExport.read(spark, root)
    assert(got.columns.contains("label") && !got.columns.contains("s"))
    assert(got.select("k", "label").orderBy("k")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // snapshot 1 still reads under ITS schema (pre-rename names)
    val at1 = IcebergExport.readAt(spark, root, 1L).columns
    assert(at1.contains("s") && !at1.contains("label"))
    // field-id continuity: 'label' in the new schema carries the id
    // 's' had in the old one (the spec's rename-keeps-the-id contract)
    import scala.jdk.CollectionConverters._
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val md = m.readTree(scala.io.Source.fromFile(m2).mkString)
    def idOf(schemaId: Int, name: String): Int =
      md.get("schemas").elements().asScala
        .find(_.get("schema-id").asInt() == schemaId).get
        .get("fields").elements().asScala
        .find(_.get("name").asText() == name).get.get("id").asInt()
    assert(idOf(md.get("current-schema-id").asInt(), "label") ==
      idOf(0, "s"))
    // name-mapping lists the files' PHYSICAL name first, the logical
    // name as an alias — how foreign engines resolve the id-less files
    val nm = md.get("properties")
      .get("schema.name-mapping.default").asText()
    assert(nm.contains("\"s\"") && nm.contains("\"label\""))
    // a merge ADDRESSED BY the new logical name keeps working, and the
    // next export keeps the id
    MergeInto.mergeBatch(spark, Seq((2L, "B")).toDF("k", "label"),
      root, "k", numBuckets = 2)
    val (s3, m3) = IcebergExport.export(spark, root)
    assert(s3 == 3L)
    assert(IcebergExport.read(spark, root).select("k", "label")
      .orderBy("k")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a"), (2L, "B")))
    val md3 = m.readTree(scala.io.Source.fromFile(m3).mkString)
    val cur3 = md3.get("schemas").elements().asScala
      .find(_.get("schema-id").asInt() ==
        md3.get("current-schema-id").asInt()).get
    assert(cur3.get("fields").elements().asScala
      .find(_.get("name").asText() == "label").get.get("id").asInt() ==
      idOf(0, "s"))

    val root2 = java.nio.file.Files.createTempDirectory("iceberg").toString
    MergeInto.mergeBatch(spark,
      Seq((1L, 10)).toDF("k", "v"), root2, "k", numBuckets = 2)
    MergeInto.addGeneratedColumn(spark, root2, "v2", "v * 2")
    val e2 = intercept[IllegalArgumentException] {
      IcebergExport.export(spark, root2)
    }
    assert(e2.getMessage.contains("VIRTUAL generated"))
  }

  test("INCREMENTAL manifest reuse: untouched manifests carry VERBATIM " +
      "(same avro path, zero bytes rewritten); a pure delete-vector " +
      "export writes NO data manifest; an unreachable delete manifest " +
      "drops from the list; the carry cap compacts back to one") {
    import scala.jdk.CollectionConverters._
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    import org.apache.avro.file.DataFileReader
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = java.nio.file.Files.createTempDirectory("iceberg").toString
    val metaDir = new java.io.File(root, "metadata")
    def listEntries(): Seq[(String, Int)] = {
      val newest = metaDir.listFiles().map(_.getName)
        .filter(_.matches("v\\d+\\.metadata\\.json"))
        .maxBy(_.stripPrefix("v").stripSuffix(".metadata.json").toInt)
      val md = m.readTree(scala.io.Source.fromFile(
        new java.io.File(metaDir, newest)).mkString)
      val sn = md.get("snapshots").elements().asScala
        .find(_.get("snapshot-id").asLong() ==
          md.get("current-snapshot-id").asLong()).get
      val r = new DataFileReader[GenericRecord](
        new java.io.File(sn.get("manifest-list").asText()),
        new GenericDatumReader[GenericRecord]())
      val recs = r.iterator().asScala.map(rec =>
        (rec.get("manifest_path").toString,
          rec.get("content").asInstanceOf[Int])).toVector
      r.close(); recs
    }
    // keys bucketed under pmod(hash, 16) so later merges can land in
    // FRESH buckets (a pure append: new file, nothing removed)
    import org.apache.spark.sql.functions.{hash => shash, pmod, lit}
    def keyIn(bucket: Int): Long = (0L until 10000L).find(k =>
      spark.range(k, k + 1).select(pmod(shash(col("id")), lit(16)))
        .head().getInt(0) == bucket).get
    // snapshot 1: two buckets' worth of data
    val k0 = keyIn(0); val k1 = keyIn(1)
    MergeInto.mergeBatch(spark,
      Seq((k0, "a"), (k1, "b")).toDF("k", "s"), root, "k",
      numBuckets = 16)
    IcebergExport.export(spark, root)
    val l1 = listEntries()
    assert(l1.size == 1 && l1.head._2 == 0)
    // snapshot 2: a key in a FRESH bucket — pure append. The prior
    // manifest must carry VERBATIM (same path), plus one new manifest.
    val k2 = keyIn(2)
    MergeInto.mergeBatch(spark, Seq((k2, "c")).toDF("k", "s"),
      root, "k", numBuckets = 16)
    IcebergExport.export(spark, root)
    val l2 = listEntries()
    assert(l2.map(_._1).contains(l1.head._1),
      s"prior manifest must carry verbatim: $l2 vs $l1")
    assert(l2.size == 2 && l2.forall(_._2 == 0))
    // snapshot 3: pure delete-vector export — NO new data manifest
    // (both data manifests carried), one delete manifest
    val m0Before = metaFiles(root).count(_.endsWith("-m0.avro"))
    MergeInto.deleteVector(spark, root, "k", Seq(k1).toDF("k"))
    IcebergExport.export(spark, root, deleteFiles = true)
    assert(metaFiles(root).count(_.endsWith("-m0.avro")) == m0Before,
      "a pure delete-vector export must write no data manifest")
    val l3 = listEntries()
    assert(l3.count(_._2 == 0) == 2 && l3.count(_._2 == 1) == 1)
    assert(l2.map(_._1).toSet.subsetOf(l3.map(_._1).toSet))
    assert(IcebergExport.read(spark, root).select("k", "s")
      .as[(Long, String)].collect().toSet ==
      Set(k0 -> "a", k2 -> "c"))
    // snapshot 4: materializing the delete rewrites k1's bucket — the
    // position delete's only referenced file is gone, so the delete
    // manifest is UNREACHABLE and must drop from the list
    MergeInto.materializeDeletes(spark, root, "k")
    IcebergExport.export(spark, root)
    val l4 = listEntries()
    assert(l4.count(_._2 == 1) == 0,
      s"unreachable delete manifest must drop: $l4")
    assert(IcebergExport.read(spark, root).select("k", "s")
      .as[(Long, String)].collect().toSet ==
      Set(k0 -> "a", k2 -> "c"))
    // carry cap: keep appending fresh buckets; the list length stays
    // AT the cap (LSM folding: the smallest carried manifests merge
    // into each fresh one instead of growing the list), and at least
    // one fold is observable as a non-growing step
    var maxSeen = l4.count(_._2 == 0)
    var folded = false
    var prevN = maxSeen
    (3 to 14).foreach { b =>
      val kb = keyIn(b)
      MergeInto.mergeBatch(spark, Seq((kb, s"v$b")).toDF("k", "s"),
        root, "k", numBuckets = 16)
      IcebergExport.export(spark, root)
      val n = listEntries().count(_._2 == 0)
      maxSeen = math.max(maxSeen, n)
      if (n <= prevN) folded = true
      prevN = n
    }
    assert(maxSeen <= 8, s"carried manifests must stay capped: $maxSeen")
    assert(folded, "the cap must fold smallest manifests, not grow")
    // the table stays correct through the whole churn
    val got = IcebergExport.read(spark, root).select("k", "s")
      .as[(Long, String)].collect().toSet
    val want = Set(k0 -> "a", k2 -> "c") ++
      (3 to 14).map(b => keyIn(b) -> s"v$b").toSet
    assert(got == want)
    // ...and time travel to the pre-churn snapshot still answers
    assert(IcebergExport.readAt(spark, root, 3L).select("k", "s")
      .as[(Long, String)].collect().toSet ==
      Set(k0 -> "a", k2 -> "c"))
  }

  test("INCREMENTAL APPEND SCAN: (from, to] yields exactly the rows " +
      "appended in range — delete snapshots skip, overwrite snapshots " +
      "refuse by name, carried manifests never re-emit old rows") {
    import org.apache.spark.sql.functions.{hash => shash, pmod, lit}
    val root = java.nio.file.Files.createTempDirectory("iceberg").toString
    def keyIn(bucket: Int): Long = (0L until 10000L).find(k =>
      spark.range(k, k + 1).select(pmod(shash(col("id")), lit(16)))
        .head().getInt(0) == bucket).get
    // snapshots 1-3: appends (fresh buckets); snapshot 4: delete-only
    val (k0, k1, k2, k3) = (keyIn(0), keyIn(1), keyIn(2), keyIn(3))
    MergeInto.mergeBatch(spark,
      Seq((k0, "a"), (k1, "b")).toDF("k", "s"), root, "k",
      numBuckets = 16)
    IcebergExport.export(spark, root)
    MergeInto.mergeBatch(spark, Seq((k2, "c")).toDF("k", "s"),
      root, "k", numBuckets = 16)
    IcebergExport.export(spark, root)
    MergeInto.mergeBatch(spark, Seq((k3, "d")).toDF("k", "s"),
      root, "k", numBuckets = 16)
    IcebergExport.export(spark, root)
    MergeInto.deleteVector(spark, root, "k", Seq(k1).toDF("k"))
    IcebergExport.export(spark, root, deleteFiles = true)
    assert(IcebergExport.snapshots(spark, root).map(_.operation) ==
      Seq("append", "append", "append", "delete"))
    def incr(from: Long, to: Long): Set[(Long, String)] =
      IcebergExport.readIncremental(spark, root, from, to)
        .select("k", "s").as[(Long, String)].collect().toSet
    // full history = every append; the delete is NOT subtracted (an
    // append scan is an insertion feed, not a snapshot diff)
    assert(incr(0L, 4L) ==
      Set(k0 -> "a", k1 -> "b", k2 -> "c", k3 -> "d"))
    // (1, 2]: only snapshot 2's append
    assert(incr(1L, 2L) == Set(k2 -> "c"))
    // (2, 4]: snapshot 3's append; the delete contributes nothing
    assert(incr(2L, 4L) == Set(k3 -> "d"))
    // (3, 4]: only the delete snapshot — empty, not an error
    assert(incr(3L, 4L).isEmpty)
    // a bucket REWRITE makes an overwrite snapshot: the scan refuses
    MergeInto.mergeBatch(spark, Seq((k0, "A")).toDF("k", "s"),
      root, "k", numBuckets = 16)
    IcebergExport.export(spark, root, deleteFiles = true)
    val e = intercept[IllegalArgumentException] {
      IcebergExport.readIncremental(spark, root, 4L, 5L).collect()
    }
    assert(e.getMessage.contains("overwrite"))
    // ...but a range that STOPS before it still answers
    assert(incr(2L, 3L) == Set(k3 -> "d"))
  }

  test("v3 DELETION VECTORS export natively: puffin blobs per data " +
      "file (framed roaring + CRC, spec footer), format-version 3, no " +
      "data manifest on a pure-delete snapshot, reader round-trips, " +
      "and a later export walks the carried puffin manifest without " +
      "parquet-reading it") {
    val root = java.nio.file.Files.createTempDirectory("iceberg").toString
    MergeInto.mergeBatch(spark,
      (0L until 400L).map(k => (k, s"v$k")).toDF("k", "s"),
      root, "k", numBuckets = 2)
    IcebergExport.export(spark, root) // snapshot 1, plain
    val dataManifestsBefore = metaFiles(root).count(_.endsWith("-m0.avro"))
    MergeInto.deleteVector(spark, root, "k",
      (0L until 400L by 3L).toDF("k"))
    val (s2, m2) = IcebergExport.export(spark, root,
      deleteFiles = true, deletionVectors = true)
    assert(s2 == 2L)
    // v3 metadata + DV summary
    val md2 = scala.io.Source.fromFile(m2).mkString
    assert(md2.contains("\"format-version\" : 3"))
    assert(md2.contains("added-dvs"))
    assert(md2.contains("added-position-deletes"))
    // the puffin file is framed per the spec: opens AND closes with
    // the magic (leading magic + trailing footer magic)
    val names2 = metaFiles(root)
    val puffinName = names2.find(_.endsWith("-dv.puffin"))
    assert(puffinName.isDefined, "expected a -dv.puffin file")
    val raw = java.nio.file.Files.readAllBytes(new java.io.File(
      new java.io.File(root, "metadata"), puffinName.get).toPath)
    assert(new String(raw.take(4), "ISO-8859-1") == "PFA1")
    assert(new String(raw.takeRight(4), "ISO-8859-1") == "PFA1")
    // the footer payload enumerates deletion-vector-v1 blobs
    assert(new String(raw, "ISO-8859-1").contains("deletion-vector-v1"))
    // a PURE delete-vector snapshot writes no new data manifest
    assert(metaFiles(root).count(_.endsWith("-m0.avro")) ==
      dataManifestsBefore)
    // ... and no position-delete parquet (the puffin IS the delete)
    assert(!names2.exists(_.endsWith("-deletes.parquet")))
    // the reader subtracts the vectors; snapshot 1 still reads all
    val want1 = (0L until 400L).filterNot(_ % 3 == 0)
    assert(IcebergExport.read(spark, root).select("k").as[Long]
      .collect().sorted.toSeq == want1)
    assert(IcebergExport.readAt(spark, root, 1L).count() == 400L)
    // idempotent re-export
    assert(IcebergExport.export(spark, root,
      deleteFiles = true, deletionVectors = true)._1 == 2L)
    // deletes ACCUMULATE; the next delete export — WITHOUT the flag —
    // still publishes puffin (a v3 table auto-upgrades: the spec
    // deprecates position-delete parquets in v3) and carries the
    // snapshot-2 puffin manifest through deleteReaches (no parquet
    // misread — the ADVICE regression)
    MergeInto.deleteVector(spark, root, "k",
      (0L until 400L by 5L).toDF("k"))
    val (s3, m3) = IcebergExport.export(spark, root, deleteFiles = true)
    assert(s3 == 3L)
    // v3 never downgrades; still no position-delete parquet anywhere
    assert(scala.io.Source.fromFile(m3).mkString
      .contains("\"format-version\" : 3"))
    assert(!metaFiles(root).exists(_.endsWith("-deletes.parquet")))
    val want2 = (0L until 400L).filter(k => k % 3 != 0 && k % 5 != 0)
    assert(IcebergExport.read(spark, root).select("k").as[Long]
      .collect().sorted.toSeq == want2)
    assert(IcebergExport.readAt(spark, root, 2L).count() ==
      want1.size.toLong)
    // a bucket rewrite after the DVs also walks the carried puffin
    // manifests safely and the rewritten key reinstates
    MergeInto.mergeBatch(spark, Seq((3L, "back")).toDF("k", "s"),
      root, "k", numBuckets = 2)
    val (s4, _) = IcebergExport.export(spark, root,
      deleteFiles = true, deletionVectors = true)
    assert(s4 == 4L)
    val after = IcebergExport.read(spark, root)
      .select("k", "s").as[(Long, String)].collect().toMap
    assert(after(3L) == "back")
    assert(!after.contains(5L) && !after.contains(6L))
  }

  test("CHANGELOG SCAN readChanges: the net key-level diff of two " +
      "snapshots equals the manifest-store change feed, covers the " +
      "overwrite snapshot readIncremental refuses, and identical " +
      "rewrites emit nothing") {
    val root = java.nio.file.Files.createTempDirectory("iceberg").toString
    MergeInto.mergeBatch(spark,
      Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30), (4L, "d", 40))
        .toDF("k", "s", "v"),
      root, "k", numBuckets = 2)
    IcebergExport.export(spark, root)
    // update k=1, delete k=2, insert k=5, rewrite k=3 IDENTICALLY
    MergeInto.mergeBatch(spark,
      Seq((1L, "A", 11, false), (2L, "b", 20, true),
        (5L, "e", 50, false), (3L, "c", 30, false))
        .toDF("k", "s", "v", "del"),
      root, "k", deleteCol = Some("del"), numBuckets = 2)
    IcebergExport.export(spark, root)
    val feed = IcebergExport.readChanges(spark, root, 1L, 2L, "k")
      .select("k", "s", "v", "_change_type")
      .as[(Long, String, Int, String)].collect().toSet
    assert(feed == Set(
      (1L, "a", 10, "update_preimage"), (1L, "A", 11, "update_postimage"),
      (2L, "b", 20, "delete"), (5L, "e", 50, "insert")))
    // identical rewrite (k=3) emitted nothing; k=4 untouched
    assert(!feed.exists(_._1 == 3L) && !feed.exists(_._1 == 4L))
    // equals the manifest-store change feed over the same two states
    val storeFeed = MergeInto.changeFeed(spark, root, "k", 1L, 2L)
      .select("k", "s", "v", "_change_type")
      .as[(Long, String, Int, String)].collect().toSet
    assert(feed == storeFeed)
    // the same range refuses as an APPEND scan (overwrite snapshot) —
    // readChanges is the documented alternative
    val e = intercept[IllegalArgumentException] {
      IcebergExport.readIncremental(spark, root, 1L, 2L).collect()
    }
    assert(e.getMessage.contains("readChanges"))

    // SCHEMA EVOLUTION across the diffed range: a column added between
    // the snapshots compares as NULL on the pre side (an update pair
    // shows null -> value), and a RENAME between them diffs as ONE
    // column under the post-rename name (field-id alignment)
    val root2 = java.nio.file.Files.createTempDirectory("iceberg").toString
    MergeInto.mergeBatch(spark,
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"), root2, "k",
      numBuckets = 2)
    IcebergExport.export(spark, root2)
    MergeInto.renameColumn(spark, root2, "s", "label")
    MergeInto.mergeBatch(spark,
      Seq((1L, "A", 0.5)).toDF("k", "label", "score"), root2, "k",
      numBuckets = 2)
    IcebergExport.export(spark, root2)
    val feed2 = IcebergExport.readChanges(spark, root2, 1L, 2L, "k")
    assert(feed2.columns.contains("label") &&
      !feed2.columns.contains("s"))
    val rows2 = feed2
      .select("k", "label", "score", "_change_type")
      .as[(Long, String, Option[Double], String)].collect().toSet
    assert(rows2 == Set(
      (1L, "a", None, "update_preimage"),
      (1L, "A", Some(0.5), "update_postimage")))
  }

  test("readIncremental RESOLVES renames and initial-defaults like " +
      "readAt: physical-named files alias back to logical names, files " +
      "predating a defaulted column answer the default — never a " +
      "silent NULL") {
    import org.apache.spark.sql.functions.{hash => shash, pmod, lit}
    val root = java.nio.file.Files.createTempDirectory("iceberg").toString
    def keyIn(bucket: Int): Long = (0L until 10000L).find(k =>
      spark.range(k, k + 1).select(pmod(shash(col("id")), lit(16)))
        .head().getInt(0) == bucket).get
    val (k0, k2) = (keyIn(0), keyIn(2))
    MergeInto.mergeBatch(spark, Seq((k0, "a")).toDF("k", "s"),
      root, "k", numBuckets = 16)
    IcebergExport.export(spark, root) // snapshot 1 (append)
    MergeInto.renameColumn(spark, root, "s", "label")
    IcebergExport.export(spark, root) // snapshot 2 (metadata-only)
    MergeInto.mergeBatch(spark, Seq((k2, "c")).toDF("k", "label"),
      root, "k", numBuckets = 16)
    IcebergExport.export(spark, root) // snapshot 3 (fresh-bucket append)
    assert(IcebergExport.snapshots(spark, root).map(_.operation) ==
      Seq("append", "append", "append"))
    // every appended file stores the PHYSICAL column 's'; the scan
    // must alias it back to 'label', never read NULLs (the r11 ADVICE
    // finding: the logical-schema scan silently nulled renamed columns)
    val all = IcebergExport.readIncremental(spark, root, 0L, 3L)
    assert(all.columns.toSeq.contains("label"))
    assert(all.select("k", "label").as[(Long, String)].collect().toSet ==
      Set(k0 -> "a", k2 -> "c"))
    // a v3 initial-default column added AFTER the appends surfaces in
    // the incremental scan too (every file predates it)
    ForeignIcebergShapes.addDefaultedColumn(root, "pri", "long",
      com.fasterxml.jackson.databind.node.JsonNodeFactory.instance
        .numberNode(9L))
    val withDefault = IcebergExport.readIncremental(spark, root, 1L, 3L)
    assert(withDefault.select("k", "label", "pri")
      .as[(Long, String, Long)].collect().toSet == Set((k2, "c", 9L)))
  }

  test("readIncremental walks the SNAPSHOT-LOG, not numeric id order: " +
      "a foreign table with random (negative, non-monotone) snapshot " +
      "ids scans the right range; the id-0 sentinel refuses when a " +
      "real snapshot claims id 0") {
    import scala.jdk.CollectionConverters._
    import org.apache.avro.generic.{GenericData, GenericDatumReader,
      GenericDatumWriter, GenericRecord}
    import org.apache.avro.file.{DataFileReader, DataFileWriter}
    import org.apache.spark.sql.functions.{hash => shash, pmod, lit}
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = java.nio.file.Files.createTempDirectory("iceberg").toString
    def keyIn(bucket: Int): Long = (0L until 10000L).find(k =>
      spark.range(k, k + 1).select(pmod(shash(col("id")), lit(16)))
        .head().getInt(0) == bucket).get
    val (k0, k1, k2) = (keyIn(0), keyIn(1), keyIn(2))
    MergeInto.mergeBatch(spark, Seq((k0, "a")).toDF("k", "s"),
      root, "k", numBuckets = 16)
    IcebergExport.export(spark, root)
    MergeInto.mergeBatch(spark, Seq((k1, "b")).toDF("k", "s"),
      root, "k", numBuckets = 16)
    IcebergExport.export(spark, root)
    MergeInto.mergeBatch(spark, Seq((k2, "c")).toDF("k", "s"),
      root, "k", numBuckets = 16)
    IcebergExport.export(spark, root)
    // forge foreign ids: commit order stays 1,2,3 in the snapshot-log
    // but ids become -5, 99, -1 — numeric order (-5, -1, 99) is WRONG
    val remap = Map(1L -> -5L, 2L -> 99L, 3L -> -1L)
    val metaDir = new java.io.File(root, "metadata")
    val mdFile = metaDir.listFiles()
      .filter(_.getName.matches("v\\d+\\.metadata\\.json"))
      .maxBy(_.getName.stripPrefix("v").stripSuffix(".metadata.json")
        .toInt)
    val md = m.readTree(new String(
      java.nio.file.Files.readAllBytes(mdFile.toPath), "UTF-8"))
      .deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
    md.put("current-snapshot-id",
      remap(md.get("current-snapshot-id").asLong()))
    md.get("snapshots").elements().asScala.foreach { s =>
      val o = s.asInstanceOf[
        com.fasterxml.jackson.databind.node.ObjectNode]
      o.put("snapshot-id", remap(o.get("snapshot-id").asLong()))
      Option(o.get("parent-snapshot-id")).filterNot(_.isNull)
        .foreach(p => o.put("parent-snapshot-id", remap(p.asLong())))
    }
    md.get("snapshot-log").elements().asScala.foreach { s =>
      val o = s.asInstanceOf[
        com.fasterxml.jackson.databind.node.ObjectNode]
      o.put("snapshot-id", remap(o.get("snapshot-id").asLong()))
    }
    val w = new java.io.PrintWriter(mdFile, "UTF-8")
    try w.print(m.writeValueAsString(md)) finally w.close()
    new java.io.File(metaDir, "." + mdFile.getName + ".crc").delete()
    // rewrite each manifest list's added_snapshot_id to the new ids
    md.get("snapshots").elements().asScala.foreach { s =>
      val listFile = new java.io.File(s.get("manifest-list").asText())
      val r = new DataFileReader[GenericRecord](listFile,
        new GenericDatumReader[GenericRecord]())
      val schema = r.getSchema
      val recs = r.iterator().asScala.toVector
      r.close()
      recs.foreach { rec =>
        val old = rec.get("added_snapshot_id").asInstanceOf[Long]
        remap.get(old).foreach(n => rec.put("added_snapshot_id", n))
      }
      assert(listFile.delete())
      val wr = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      wr.create(schema, listFile)
      recs.foreach(wr.append)
      wr.close()
      new java.io.File(listFile.getParentFile,
        "." + listFile.getName + ".crc").delete()
    }
    def incr(from: Long, to: Long): Set[(Long, String)] =
      IcebergExport.readIncremental(spark, root, from, to)
        .select("k", "s").as[(Long, String)].collect().toSet
    // (-5, 99] = commit 2 only; (99, -1] = commit 3 only (numeric
    // interval logic would refuse or mis-select both)
    assert(incr(-5L, 99L) == Set(k1 -> "b"))
    assert(incr(99L, -1L) == Set(k2 -> "c"))
    // sentinel 0 = from the beginning (no snapshot claims id 0 here)
    assert(incr(0L, -1L) ==
      Set(k0 -> "a", k1 -> "b", k2 -> "c"))
    // expired-from still refuses by name
    val e = intercept[IllegalArgumentException] {
      IcebergExport.readIncremental(spark, root, 7L, -1L)
    }
    assert(e.getMessage.contains("no snapshot 7"))
    // a table where a REAL snapshot claims id 0 makes the sentinel
    // ambiguous — refuse, never guess
    val remap0 = Map(-5L -> 0L)
    val md0 = m.readTree(new String(
      java.nio.file.Files.readAllBytes(mdFile.toPath), "UTF-8"))
      .deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
    (md0.get("snapshots").elements().asScala ++
        md0.get("snapshot-log").elements().asScala).foreach { s =>
      val o = s.asInstanceOf[
        com.fasterxml.jackson.databind.node.ObjectNode]
      remap0.get(o.get("snapshot-id").asLong())
        .foreach(n => o.put("snapshot-id", n))
    }
    val w0 = new java.io.PrintWriter(mdFile, "UTF-8")
    try w0.print(m.writeValueAsString(md0)) finally w0.close()
    new java.io.File(metaDir, "." + mdFile.getName + ".crc").delete()
    val e0 = intercept[IllegalArgumentException] {
      IcebergExport.readIncremental(spark, root, 0L, -1L)
    }
    assert(e0.getMessage.contains("sentinel"))
  }

  test("METADATA TABLES: snapshots/history/refs/manifests/files answer " +
      "from metadata alone and agree with the table's own accounting; " +
      "unknown kinds refuse by name") {
    val root = java.nio.file.Files.createTempDirectory("iceberg").toString
    MergeInto.mergeBatch(spark,
      (0L until 100L).map(k => (k, s"v$k")).toDF("k", "s"),
      root, "k", numBuckets = 2)
    IcebergExport.export(spark, root)
    MergeInto.deleteVector(spark, root, "k", Seq(7L, 14L).toDF("k"))
    IcebergExport.export(spark, root, deleteFiles = true)
    def meta(kind: String) = IcebergExport.metaTable(spark, root, kind)
    // snapshots: two, linked by parent_id, narrowest operations
    val sn = meta("snapshots")
      .select("snapshot_id", "parent_id", "operation")
      .as[(Long, Option[Long], String)].collect().sortBy(_._1).toSeq
    assert(sn == Seq((1L, None, "append"), (2L, Some(1L), "delete")))
    // history: commit order, current flagged last
    val hist = meta("history").select("snapshot_id", "is_current")
      .as[(Long, Boolean)].collect().toSeq
    assert(hist == Seq((1L, false), (2L, true)))
    // refs: main tracks the current snapshot
    assert(meta("refs").select("name", "type", "snapshot_id")
      .as[(String, String, Long)].collect().toSeq ==
      Seq(("main", "branch", 2L)))
    // manifests: one carried data manifest + one delete manifest
    val mfs = meta("manifests").select("content", "added_snapshot_id")
      .as[(Int, Long)].collect().sorted.toSeq
    assert(mfs == Seq((0, 1L), (1, 2L)))
    // files: data entries account for every row, the position-delete
    // entry for both deleted keys; nothing reads a data file to answer
    val files = meta("files")
      .groupBy(col("content")).agg(sum(col("record_count")).as("n"))
      .as[(Int, Long)].collect().sorted.toSeq
    assert(files == Seq((0, 100L), (1, 2L)))
    val e = intercept[IllegalArgumentException] {
      IcebergExport.metaTable(spark, root, "partitions")
    }
    assert(e.getMessage.contains("unknown iceberg metadata table"))
  }

  test("PARTITION-SPEC EVOLUTION: a table whose old manifests are " +
      "unpartitioned (spec 0) and new ones identity-partitioned " +
      "(spec 1) reads correctly per manifest — values right, pruning " +
      "applies only to the spec-1 files") {
    import scala.jdk.CollectionConverters._
    import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter,
      GenericRecord}
    import org.apache.avro.file.{DataFileReader, DataFileWriter}
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    // table A: unpartitioned (spec 0); table B: partitioned by dt
    // (spec with real source ids) — same logical schema
    val rootA = java.nio.file.Files.createTempDirectory("iceberg").toString
    val rootB = java.nio.file.Files.createTempDirectory("iceberg").toString
    IcebergExport.publish(spark,
      Seq((1L, "x", "a"), (2L, "y", "a")).toDF("k", "s", "dt"), rootA)
    IcebergExport.exportPartitioned(spark,
      Seq((3L, "z", "b"), (4L, "w", "c")).toDF("k", "s", "dt"),
      rootB, Seq("dt"))
    // forge: splice B's partition spec (as spec-id 1) and B's manifests
    // (partition_spec_id rewritten to 1) into A's metadata — the shape
    // a real `ALTER TABLE ... ADD PARTITION FIELD` leaves behind: old
    // manifests keep spec 0, new ones carry spec 1
    def newest(root: String) = new java.io.File(root, "metadata")
      .listFiles().filter(_.getName.matches("v\\d+\\.metadata\\.json"))
      .maxBy(_.getName.stripPrefix("v").stripSuffix(".metadata.json").toInt)
    val mdA = m.readTree(new String(java.nio.file.Files.readAllBytes(
      newest(rootA).toPath), "UTF-8"))
      .deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
    val mdB = m.readTree(new String(java.nio.file.Files.readAllBytes(
      newest(rootB).toPath), "UTF-8"))
    // align spec-1's source-id to A's schema (same field order, ids
    // assigned identically by the exporter — assert to be safe)
    def idOf(md: com.fasterxml.jackson.databind.JsonNode,
        name: String): Int =
      md.get("schemas").elements().asScala.next()
        .get("fields").elements().asScala
        .find(_.get("name").asText() == name).get.get("id").asInt()
    assert(idOf(mdA, "dt") == idOf(mdB, "dt"))
    val specB = mdB.get("partition-specs").elements().asScala.next()
      .deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
    specB.put("spec-id", 1)
    mdA.withArray("partition-specs").add(specB)
    mdA.put("last-partition-id", 1000)
    // append B's manifest-list records (spec id -> 1) to A's list
    val listA = new java.io.File(mdA.get("snapshots").elements().asScala
      .next().get("manifest-list").asText())
    val listB = new java.io.File(mdB.get("snapshots").elements().asScala
      .next().get("manifest-list").asText())
    def records(f: java.io.File) = {
      val r = new DataFileReader[GenericRecord](f,
        new GenericDatumReader[GenericRecord]())
      val (schema, recs) = (r.getSchema, r.iterator().asScala.toVector)
      r.close(); (schema, recs)
    }
    val (schemaA, recsA) = records(listA)
    val (_, recsB) = records(listB)
    recsB.foreach(_.put("partition_spec_id", 1))
    assert(listA.delete())
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schemaA))
    w.create(schemaA, listA)
    (recsA ++ recsB).foreach(w.append)
    w.close()
    new java.io.File(listA.getParentFile,
      "." + listA.getName + ".crc").delete()
    val wA = new java.io.PrintWriter(newest(rootA), "UTF-8")
    try wA.print(m.writeValueAsString(mdA)) finally wA.close()
    new java.io.File(newest(rootA).getParentFile,
      "." + newest(rootA).getName + ".crc").delete()
    // the union reads correctly across both specs
    val got = IcebergExport.read(spark, rootA)
    assert(got.select("k", "s", "dt").as[(Long, String, String)]
      .collect().sorted.toSeq == Seq((1L, "x", "a"), (2L, "y", "a"),
        (3L, "z", "b"), (4L, "w", "c")))
    // a dt predicate prunes the spec-1 manifests' partition values;
    // spec-0 files (no partition tuple) are scanned, values still right
    val filtered = IcebergExport.read(spark, rootA)
      .filter(col("dt") === "b")
    filtered.collect()
    val exec = filtered.queryExecution.executedPlan
    val finalPlan = exec.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.executedPlan
    }.getOrElse(exec)
    val scanned = (finalPlan.collectLeaves() :+ finalPlan).collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numFiles").value
    }.get
    val total = IcebergExport.read(spark, rootA).inputFiles.length
    assert(scanned < total,
      s"expected the dt=c spec-1 file pruned from manifest values, " +
        s"scanned $scanned of $total")
    assert(filtered.select("k", "s", "dt").as[(Long, String, String)]
      .collect().toSeq == Seq((3L, "z", "b")))
  }

  test("SNAPSHOT REFS: export maintains the main branch, foreign tags " +
      "carry across exports, readRef resolves by name, unknown refs " +
      "refuse listing the known ones, expiration drops dangling refs") {
    val root = java.nio.file.Files.createTempDirectory("iceberg").toString
    MergeInto.mergeBatch(spark,
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"), root, "k", numBuckets = 2)
    IcebergExport.export(spark, root)
    MergeInto.mergeBatch(spark, Seq((1L, "A")).toDF("k", "s"),
      root, "k", numBuckets = 2)
    IcebergExport.export(spark, root)
    // main tracks the current snapshot
    assert(IcebergExport.readRef(spark, root, "main")
      .select("k", "s").as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "A"), (2L, "b")))
    // a foreign tag at snapshot 1 resolves to the pre-update state...
    ForeignIcebergShapes.addRef(root, "audit", 1L)
    assert(IcebergExport.readRef(spark, root, "audit")
      .select("k", "s").as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // ...and CARRIES across the next export, while main advances
    MergeInto.mergeBatch(spark, Seq((2L, "B")).toDF("k", "s"),
      root, "k", numBuckets = 2)
    IcebergExport.export(spark, root)
    assert(IcebergExport.readRef(spark, root, "audit")
      .select("k", "s").as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "a"), (2L, "b")))
    assert(IcebergExport.readRef(spark, root, "main")
      .select("k", "s").as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "A"), (2L, "B")))
    // unknown refs refuse by name, listing the known ones
    val e = intercept[IllegalArgumentException] {
      IcebergExport.readRef(spark, root, "nope")
    }
    assert(e.getMessage.contains("no ref 'nope'") &&
      e.getMessage.contains("audit") && e.getMessage.contains("main"))
    // expiration drops refs whose snapshot expired; main survives
    IcebergExport.expireSnapshots(spark, root, keepLast = 1)
    val e2 = intercept[IllegalArgumentException] {
      IcebergExport.readRef(spark, root, "audit")
    }
    assert(e2.getMessage.contains("no ref 'audit'"))
    assert(IcebergExport.readRef(spark, root, "main")
      .select("k", "s").as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "A"), (2L, "B")))
  }

  test("NESTED v3 initial-defaults: a struct child added after the " +
      "files surfaces inside every non-null struct; a NULL struct " +
      "stays NULL; a default inside a LIST element refuses by name") {
    val root = java.nio.file.Files.createTempDirectory("iceberg").toString
    val df = Seq((1L, Some(("a", 10)), Seq(1, 2)),
        (2L, None, Seq(3)),
        (3L, Some(("c", 30)), Seq.empty[Int]))
      .toDF("k", "info", "xs")
    IcebergExport.publish(spark, df, root)
    ForeignIcebergShapes.addNestedDefaultedColumn(root, "info", "flag",
      "long", com.fasterxml.jackson.databind.node.JsonNodeFactory
        .instance.numberNode(7L))
    val got = IcebergExport.read(spark, root)
      .select(col("k"), col("info._1").as("a"), col("info.flag"),
        (col("info").isNull).as("structNull"))
      .as[(Long, Option[String], Option[Long], Boolean)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, Some("a"), Some(7L), false),
      (2L, None, None, true), // null struct stays null
      (3L, Some("c"), Some(7L), false)))
    // a default buried in a list element struct refuses by name
    val root2 = java.nio.file.Files.createTempDirectory("iceberg").toString
    val df2 = Seq((1L, Seq(("a", 1)))).toDF("k", "items")
    IcebergExport.publish(spark, df2, root2)
    // hand-add an initial-default to a field of the list's element
    import scala.jdk.CollectionConverters._
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val metaDir2 = new java.io.File(root2, "metadata")
    val mdFile2 = metaDir2.listFiles()
      .filter(_.getName.matches("v\\d+\\.metadata\\.json")).head
    val md2 = m.readTree(new String(
      java.nio.file.Files.readAllBytes(mdFile2.toPath), "UTF-8"))
      .deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
    md2.put("format-version", 3)
    val itemsType = md2.get("schemas").elements().asScala.next()
      .get("fields").elements().asScala
      .find(_.get("name").asText() == "items").get.get("type")
    val elemFields = itemsType.get("element").get("fields")
      .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode]
    elemFields.get(0)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      .put("initial-default", "zz")
    val w2 = new java.io.PrintWriter(mdFile2, "UTF-8")
    try w2.print(m.writeValueAsString(md2)) finally w2.close()
    new java.io.File(metaDir2, "." + mdFile2.getName + ".crc").delete()
    val e = intercept[IllegalArgumentException] {
      IcebergExport.read(spark, root2).collect()
    }
    assert(e.getMessage.contains("INSIDE a list/map"))
  }

  test("name mapping is scoped to ID-LESS files: an id-bearing file " +
      "in a renamed table resolves by its OWN footer ids (logical-name " +
      "storage reads through; a same-named column with a DIFFERENT id " +
      "reads NULL, never aliased through the mapping)") {
    import scala.jdk.CollectionConverters._
    import org.apache.avro.generic.{GenericData, GenericDatumReader,
      GenericDatumWriter, GenericRecord}
    import org.apache.avro.file.{DataFileReader, DataFileWriter}
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = java.nio.file.Files.createTempDirectory("iceberg").toString
    MergeInto.mergeBatch(spark,
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"), root, "k", numBuckets = 2)
    IcebergExport.export(spark, root)
    MergeInto.renameColumn(spark, root, "s", "label")
    val (_, mdPath) = IcebergExport.export(spark, root)
    val md = m.readTree(scala.io.Source.fromFile(mdPath).mkString)
    val cur = md.get("schemas").elements().asScala
      .find(_.get("schema-id").asInt() ==
        md.get("current-schema-id").asInt()).get
    def idOf(name: String): Long = cur.get("fields").elements().asScala
      .find(_.get("name").asText() == name).get.get("id").asLong()

    // two FOREIGN id-bearing data files (a post-rename Iceberg writer's
    // shape — parquet field ids embedded, columns stored under whatever
    // name was current):
    //  idfile: stores (k, label) under the LOGICAL names, correct ids
    //  poison: stores (k, s) where 's' — the name-mapping's physical
    //          name for 'label' — carries a DIFFERENT (unknown) id, and
    //          label's id is ABSENT: label must surface NULL
    def fid(id: Long) = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("parquet.field.id", id).build()
    def stageIdFile(df: org.apache.spark.sql.DataFrame,
        name: String): java.io.File = {
      val tmpd = java.nio.file.Files.createTempDirectory("idf").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmpd)
      val part = new java.io.File(tmpd).listFiles()
        .find(_.getName.startsWith("part-")).get
      val out = new java.io.File(root, name)
      java.nio.file.Files.move(part.toPath, out.toPath)
      out
    }
    val idfile = stageIdFile(
      Seq((5L, "idfile")).toDF("k", "label").select(
        col("k").as("k", fid(idOf("k"))),
        col("label").as("label", fid(idOf("label")))), "fid-a.parquet")
    val poison = stageIdFile(
      Seq((6L, "WRONG")).toDF("k", "s").select(
        col("k").as("k", fid(idOf("k"))),
        col("s").as("s", fid(999L))), "fid-b.parquet")

    // splice both into the current snapshot: a new DATA manifest (avro
    // schemas cloned from the table's own files, the foreign-engine
    // move) appended to the manifest list in place
    val metaDir = new java.io.File(root, "metadata")
    val sn = md.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() ==
        md.get("current-snapshot-id").asLong()).get
    val listFile = new java.io.File(sn.get("manifest-list").asText())
    val listReader = new DataFileReader[GenericRecord](listFile,
      new GenericDatumReader[GenericRecord]())
    val listSchema = listReader.getSchema
    val listRecs = listReader.iterator().asScala.toVector
    listReader.close()
    val dataMf = listRecs.find(r => r.get("content") == 0).get
    val mfFile = new java.io.File(dataMf.get("manifest_path").toString)
    val mfReader = new DataFileReader[GenericRecord](mfFile,
      new GenericDatumReader[GenericRecord]())
    val entrySchema = mfReader.getSchema
    mfReader.close()
    val seq = md.get("last-sequence-number").asLong()
    def entryFor(f: java.io.File): GenericRecord = {
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1)
      e.put("snapshot_id", seq)
      e.put("sequence_number", seq)
      e.put("file_sequence_number", seq)
      val dfr = new GenericData.Record(
        entrySchema.getField("data_file").schema())
      dfr.put("content", 0)
      dfr.put("file_path", f.getAbsolutePath)
      dfr.put("file_format", "PARQUET")
      dfr.put("partition", new GenericData.Record(
        dfr.getSchema.getField("partition").schema()))
      dfr.put("record_count", 1L)
      dfr.put("file_size_in_bytes", f.length())
      e.put("data_file", dfr)
      e
    }
    val newMf = new java.io.File(metaDir, "forged-m9.avro")
    val mw = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](entrySchema))
    mw.create(entrySchema, newMf)
    mw.append(entryFor(idfile)); mw.append(entryFor(poison))
    mw.close()
    val mfRec = new GenericData.Record(listSchema)
    listSchema.getFields.asScala.foreach(f =>
      mfRec.put(f.name(), dataMf.get(f.name())))
    mfRec.put("manifest_path", newMf.getAbsolutePath)
    mfRec.put("manifest_length", newMf.length())
    mfRec.put("added_files_count", 2)
    mfRec.put("existing_files_count", 0)
    mfRec.put("added_rows_count", 2L)
    mfRec.put("existing_rows_count", 0L)
    assert(listFile.delete())
    val lw = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](listSchema))
    lw.create(listSchema, listFile)
    (listRecs :+ mfRec).foreach(lw.append)
    lw.close()
    new java.io.File(metaDir, "." + listFile.getName + ".crc").delete()

    val got = IcebergExport.read(spark, root)
      .select("k", "label").orderBy("k")
      .as[(Long, Option[String])].collect().toSeq
    assert(got == Seq(1L -> Some("a"), 2L -> Some("b"),
      5L -> Some("idfile"), 6L -> None),
      "id-bearing files must resolve by their own footer ids: the " +
        "logical-name file reads through, the poison file's same-named " +
        "different-id column must surface NULL — got " + got)
  }

  test("MIXED-SEQUENCE equality deletes: interleaved delete/merge " +
      "cycles scope each delete to strictly-older files — a key " +
      "re-inserted AFTER its delete survives, carried files still " +
      "drop theirs") {
    val root = java.nio.file.Files.createTempDirectory("iceberg").toString
    // seq 1: keys 0..99
    MergeInto.mergeBatch(spark,
      (0L until 100L).map(k => (k, s"v$k")).toDF("k", "s"),
      root, "k", numBuckets = 8)
    IcebergExport.export(spark, root)
    // seq 2: equality-delete every k%7==0 (files all carried @1)
    MergeInto.deleteVector(spark, root, "k",
      (0L until 100L by 7L).toDF("k"))
    IcebergExport.export(spark, root, deleteFiles = true,
      equalityDeletes = true)
    // merge RE-INSERTS k=14 and updates k=3; their buckets rewrite,
    // their keys leave the pending DV (MergeInto invariant)
    MergeInto.mergeBatch(spark,
      Seq((14L, "back"), (3L, "upd")).toDF("k", "s"),
      root, "k", numBuckets = 8)
    // seq 3: remaining pending keys ship as a second equality delete;
    // the rewritten buckets are FRESH files in this snapshot — legal
    // because no pending key hashes to a rewritten bucket
    IcebergExport.export(spark, root, deleteFiles = true,
      equalityDeletes = true)
    val got = IcebergExport.read(spark, root).select("k", "s")
      .orderBy("k").as[(Long, String)].collect().toSeq
    val want = ((0L until 100L)
      .filter(k => k % 7 != 0 && k != 3).map(k => (k, s"v$k")) ++
      Seq((14L, "back"), (3L, "upd"))).sortBy(_._1)
    assert(got == want,
      "delete@2 must reach seq-1 files but NOT the seq-3 re-insert")
    // the plan really is per-group: a union of scans, not one global
    // anti-join (k=14 would be wrongly deleted by a global apply)
    assert(got.exists(_ == (14L -> "back")))
    // equality mode refuses when a pending key's bucket is fresh:
    // delete a key, then rewrite ITS OWN bucket via a raw re-merge of
    // the same key set WITHOUT clearing... (not constructible through
    // MergeInto — its invariant clears rewritten buckets' keys), so
    // instead assert the first-export shape still refuses
    val root2 = java.nio.file.Files.createTempDirectory("iceberg").toString
    MergeInto.mergeBatch(spark,
      (0L until 10L).map(k => (k, k)).toDF("k", "v"),
      root2, "k", numBuckets = 2)
    MergeInto.deleteVector(spark, root2, "k", Seq(0L).toDF("k"))
    val e = intercept[IllegalArgumentException] {
      IcebergExport.export(spark, root2, deleteFiles = true,
        equalityDeletes = true)
    }
    assert(e.getMessage.contains("position deletes instead"))
  }

  test("v3 PUFFIN deletion vectors read natively: the blob's framed " +
      "roaring bitmap subtracts the referenced file's positions; a " +
      "corrupted CRC and a missing referenced_data_file refuse loudly") {
    import scala.jdk.CollectionConverters._
    import org.apache.avro.generic.{GenericData, GenericDatumReader,
      GenericDatumWriter, GenericRecord}
    import org.apache.avro.file.{DataFileReader, DataFileWriter}
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = java.nio.file.Files.createTempDirectory("iceberg").toString
    MergeInto.mergeBatch(spark,
      (0L until 40L).map(k => (k, s"v$k")).toDF("k", "s"),
      root, "k", numBuckets = 2)
    IcebergExport.export(spark, root)
    val metaDir = new java.io.File(root, "metadata")

    // pick one data file; its row positions for keys to delete
    val md0 = m.readTree(scala.io.Source.fromFile(
      new java.io.File(metaDir, "v1.metadata.json")).mkString)
    val sn = md0.get("snapshots").elements().asScala.next()
    val listFile = new java.io.File(sn.get("manifest-list").asText())
    val lr = new DataFileReader[GenericRecord](listFile,
      new GenericDatumReader[GenericRecord]())
    val listSchema = lr.getSchema
    val listRecs = lr.iterator().asScala.toVector
    lr.close()
    val mr = new DataFileReader[GenericRecord](
      new java.io.File(listRecs.head.get("manifest_path").toString),
      new GenericDatumReader[GenericRecord]())
    val dataFile = mr.iterator().asScala.next()
      .get("data_file").asInstanceOf[GenericRecord]
      .get("file_path").toString
    mr.close()
    val inFile = spark.read.parquet(dataFile)
      .select(col("k"), col("_metadata.row_index").as("pos"))
      .as[(Long, Long)].collect().toMap
    val keysInFile = inFile.keys.toSeq.sorted
    val delKeys = keysInFile.take(3)
    val delPos = delKeys.map(inFile)

    // PUFFIN file: magic, one deletion-vector-v1 blob (BE framed len,
    // bitmap magic + portable roaring, BE CRC-32), trailing junk footer
    val bmp = RoaringBitmap64(delPos).serialize()
    val frame = java.nio.ByteBuffer.allocate(4 + bmp.length + 4)
    frame.putInt(bmp.length)
    frame.put(bmp)
    val crc = new java.util.zip.CRC32(); crc.update(bmp)
    frame.putInt(crc.getValue.toInt)
    val puffin = new java.io.File(metaDir, "dv.puffin")
    val po = new java.io.FileOutputStream(puffin)
    val magic = Array[Byte]('P', 'F', 'A', '1')
    po.write(magic); po.write(frame.array())
    po.write(magic); po.write("{}".getBytes("UTF-8")) // fake footer
    po.close()
    val blobOffset = 4L
    val blobSize = (4 + bmp.length + 4).toLong

    // v3 delete manifest carrying the DV reference fields
    val v3Entry = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"snapshot_id","type":["null","long"],"default":null},
        |{"name":"sequence_number","type":["null","long"],"default":null},
        |{"name":"file_sequence_number","type":["null","long"],
        | "default":null},
        |{"name":"data_file","type":{"type":"record","name":"r2",
        | "fields":[
        |  {"name":"content","type":"int"},
        |  {"name":"file_path","type":"string"},
        |  {"name":"file_format","type":"string"},
        |  {"name":"partition","type":{"type":"record","name":"r102",
        |   "fields":[]}},
        |  {"name":"record_count","type":"long"},
        |  {"name":"file_size_in_bytes","type":"long"},
        |  {"name":"referenced_data_file","type":["null","string"],
        |   "default":null},
        |  {"name":"content_offset","type":["null","long"],
        |   "default":null},
        |  {"name":"content_size_in_bytes","type":["null","long"],
        |   "default":null}
        |]}}]}""".stripMargin)
    def writeDvManifest(name: String,
        put: GenericRecord => Unit): java.io.File = {
      val e = new GenericData.Record(v3Entry)
      e.put("status", 1); e.put("snapshot_id", 1L)
      e.put("sequence_number", 1L); e.put("file_sequence_number", 1L)
      val dfr = new GenericData.Record(
        v3Entry.getField("data_file").schema())
      dfr.put("content", 1)
      dfr.put("file_path", puffin.getAbsolutePath)
      dfr.put("file_format", "PUFFIN")
      dfr.put("partition", new GenericData.Record(
        dfr.getSchema.getField("partition").schema()))
      dfr.put("record_count", delPos.size.toLong)
      dfr.put("file_size_in_bytes", puffin.length())
      dfr.put("referenced_data_file", dataFile)
      dfr.put("content_offset", blobOffset)
      dfr.put("content_size_in_bytes", blobSize)
      put(dfr)
      e.put("data_file", dfr)
      val out = new java.io.File(metaDir, name)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](v3Entry))
      w.create(v3Entry, out); w.append(e); w.close()
      out
    }
    def spliceList(dvManifest: java.io.File): Unit = {
      val rec = new GenericData.Record(listSchema)
      listSchema.getFields.asScala.foreach(f =>
        rec.put(f.name(), listRecs.head.get(f.name())))
      rec.put("manifest_path", dvManifest.getAbsolutePath)
      rec.put("manifest_length", dvManifest.length())
      rec.put("content", 1)
      rec.put("added_files_count", 1)
      rec.put("existing_files_count", 0)
      rec.put("added_rows_count", delPos.size.toLong)
      rec.put("existing_rows_count", 0L)
      assert(listFile.delete())
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](listSchema))
      w.create(listSchema, listFile)
      (listRecs :+ rec).foreach(w.append)
      w.close()
      new java.io.File(metaDir, "." + listFile.getName + ".crc").delete()
    }
    spliceList(writeDvManifest("forged-dv-m1.avro", _ => ()))
    // bump to format-version 3 (DVs are a v3 feature)
    val mdFile = new java.io.File(metaDir, "v1.metadata.json")
    val txt = scala.io.Source.fromFile(mdFile).mkString
    val w3 = new java.io.PrintWriter(mdFile, "UTF-8")
    try w3.print(txt.replace("\"format-version\" : 2",
      "\"format-version\" : 3")) finally w3.close()
    new java.io.File(metaDir, "." + mdFile.getName + ".crc").delete()

    val got = IcebergExport.read(spark, root).select("k").as[Long]
      .collect().sorted.toSeq
    assert(got == (0L until 40L).filterNot(delKeys.contains).sorted,
      s"DV must subtract exactly ${delKeys.sorted} — got ${got.size} rows")

    // corrupted bitmap byte (inside the CRC-covered body) refuses loudly
    val raw2 = java.nio.file.Files.readAllBytes(puffin.toPath)
    raw2(12) = (raw2(12) ^ 0x5a).toByte
    java.nio.file.Files.write(puffin.toPath, raw2)
    new java.io.File(metaDir, ".dv.puffin.crc").delete()
    val eCrc = intercept[IllegalArgumentException] {
      IcebergExport.read(spark, root).collect()
    }
    assert(eCrc.getMessage.contains("CRC"))
    java.nio.file.Files.write(puffin.toPath,
      java.nio.file.Files.readAllBytes(puffin.toPath)
        .updated(12, (raw2(12) ^ 0x5a).toByte))
    new java.io.File(metaDir, ".dv.puffin.crc").delete()

    // a DV without referenced_data_file refuses by name
    spliceList(writeDvManifest("forged-dv-m2.avro",
      _.put("referenced_data_file", null)))
    val eRef = intercept[IllegalArgumentException] {
      IcebergExport.read(spark, root).collect()
    }
    assert(eRef.getMessage.contains("referenced_data_file"))
  }

  test("refusals are loud and by name; a missing version hint falls " +
      "back to the newest metadata file") {
    val root = java.nio.file.Files.createTempDirectory("iceberg").toString
    MergeInto.mergeBatch(spark,
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"), root, "k", numBuckets = 2)
    IcebergExport.export(spark, root)

    // hint deleted -> newest v*.metadata.json still answers
    val hint = new java.io.File(new java.io.File(root, "metadata"),
      "version-hint.text")
    assert(hint.delete())
    assert(IcebergExport.read(spark, root).count() == 2)

    // a pending deletion vector refuses the export by name
    MergeInto.deleteVector(spark, root, "k", Seq(1L).toDF("k"))
    val e0 = intercept[IllegalArgumentException] {
      IcebergExport.export(spark, root)
    }
    assert(e0.getMessage.contains("materializeDeletes"))
    MergeInto.materializeDeletes(spark, root, "k")
    IcebergExport.export(spark, root)
    assert(IcebergExport.read(spark, root).select("k").as[Long]
      .collect().toSeq == Seq(2L))

    // format-version 3 WITHOUT v3-only features reads (the structures
    // are upward-compatible); v3 column DEFAULTS refuse by name; v4
    // refuses outright
    val mdDir = new java.io.File(root, "metadata")
    val newest = mdDir.listFiles().map(_.getName)
      .filter(_.matches("v\\d+\\.metadata\\.json")).sorted.last
    val txt = scala.io.Source.fromFile(
      new java.io.File(mdDir, newest)).mkString
    val vNum = newest.stripPrefix("v")
      .stripSuffix(".metadata.json").toInt
    val bump = s"v${vNum + 1}.metadata.json"
    def forge(content: String): Unit = {
      val w = new java.io.PrintWriter(
        new java.io.File(mdDir, bump), "UTF-8")
      try w.print(content) finally w.close()
      new java.io.File(mdDir, "." + bump + ".crc").delete()
      val hw = new java.io.PrintWriter(
        new java.io.File(mdDir, "version-hint.text"), "UTF-8")
      try hw.print((vNum + 1).toString) finally hw.close()
      new java.io.File(mdDir, ".version-hint.text.crc").delete()
    }
    forge(txt.replace("\"format-version\" : 2",
      "\"format-version\" : 3"))
    assert(IcebergExport.read(spark, root).select("k").as[Long]
      .collect().toSeq == Seq(2L),
      "a v3 table using no v3-only feature must read")
    // a v3 initial-default on a STORED column reads through unchanged
    // (the default only fires for files that lack the field)
    forge(txt.replace("\"format-version\" : 2",
        "\"format-version\" : 3")
      .replaceFirst("\\\"name\\\" : \\\"k\\\"",
        "\\\"name\\\" : \\\"k\\\", \\\"initial-default\\\" : 7"))
    assert(IcebergExport.read(spark, root).select("k").as[Long]
      .collect().toSeq == Seq(2L),
      "a default on a stored column must not change its values")
    // an ADDED defaulted column: no data file stores it, so every row
    // surfaces the initial-default (the v3 read-side semantics)
    locally {
      import scala.jdk.CollectionConverters._
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val mdNode = m.readTree(txt)
        .deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
      mdNode.put("format-version", 3)
      val curSchema = mdNode.get("schemas").elements().asScala
        .find(_.get("schema-id").asInt() ==
          mdNode.get("current-schema-id").asInt()).get
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      val bonus = curSchema.withArray("fields").addObject()
      bonus.put("id", 99).put("name", "bonus")
        .put("required", false).put("type", "long")
        .put("initial-default", 7)
      forge(m.writeValueAsString(mdNode))
      assert(IcebergExport.read(spark, root).select("k", "bonus")
        .as[(Long, Long)].collect().toSeq == Seq((2L, 7L)),
        "an added defaulted column must surface the default, not NULL")
      // ...and an undecodable default (wrong JSON shape) refuses by name
      bonus.put("initial-default", "not-a-long")
      forge(m.writeValueAsString(mdNode))
      val eDef = intercept[IllegalArgumentException] {
        IcebergExport.read(spark, root).collect()
      }
      assert(eDef.getMessage.contains("initial-default"))
    }
    // v4 refuses outright
    forge(txt.replace("\"format-version\" : 2",
      "\"format-version\" : 4"))
    val e1 = intercept[IllegalArgumentException] {
      IcebergExport.read(spark, root)
    }
    assert(e1.getMessage.contains("format-version 4"))
    assert(new java.io.File(mdDir, bump).delete())
    val hw2 = new java.io.PrintWriter(
      new java.io.File(mdDir, "version-hint.text"), "UTF-8")
    try hw2.print(vNum.toString) finally hw2.close()
    new java.io.File(mdDir, ".version-hint.text.crc").delete()

    // a snapshot id that never existed refuses
    val e2 = intercept[IllegalArgumentException] {
      IcebergExport.readAt(spark, root, 99L)
    }
    assert(e2.getMessage.contains("no snapshot 99"))
  }
}
