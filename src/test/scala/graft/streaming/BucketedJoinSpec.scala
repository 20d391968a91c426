package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The co-located-join contract of the bucketed merge table: the scan
  * declares `HashPartitioning(key, n)` (bucket ids stamped into file
  * names at write, verified at read), so key-equi joins and aggregations
  * between same-bucketed tables run with ZERO shuffle — and the answers
  * are identical to the exchange-bearing plan.
  */
class BucketedJoinSpec extends SparkSpec {

  import spark.implicits._

  /** Shuffle count from the FINALIZED plan's rendering: every shuffle in
    * an executed AQE plan materializes as a `ShuffleQueryStage` (a tree
    * collect misses the exchanges hidden inside the stages, and the node
    * renders as plain "Exchange", shared with broadcast).
    */
  private def exchanges(df: DataFrame): Int = {
    df.collect() // force AQE to finalize
    "ShuffleQueryStage".r
      .findAllIn(df.queryExecution.executedPlan.toString).size
  }

  private def noBroadcast[T](f: => T): T = {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("two same-bucketed tables join on the key with ZERO shuffle, and " +
      "equal the exchange plan's answer") {
    val a = java.nio.file.Files.createTempDirectory("bj").toString + "/a"
    val b = java.nio.file.Files.createTempDirectory("bj").toString + "/b"
    MergeInto.mergeBatch(spark,
      (0L until 1000L).map(i => (i, s"s$i")).toDF("k", "s"),
      a, "k", numBuckets = 8)
    MergeInto.mergeBatch(spark,
      (0L until 1000L by 3L).map(i => (i, i * 2)).toDF("k", "v"),
      b, "k", numBuckets = 8)

    noBroadcast {
      val joined = MergeInto.readTable(spark, a)
        .join(MergeInto.readTable(spark, b).drop("__bucket"), Seq("k"))
        .select(col("k"), col("s"), col("v"))
      assert(exchanges(joined) == 0,
        "a same-bucketed key join must not shuffle")
      val got = joined.as[(Long, String, Long)].collect().sorted.toSeq
      val want = (0L until 1000L by 3L).map(i => (i, s"s$i", i * 2)).toSeq
      assert(got == want)

      // aggregation on the key: partial+final without an exchange
      val agg = MergeInto.readTable(spark, a).groupBy(col("k"))
        .agg(count(lit(1)).as("n"))
      assert(exchanges(agg) == 0,
        "a bucket-key aggregation must not shuffle")
      assert(agg.agg(sum(col("n"))).as[Long].head() == 1000L)
    }
  }

  test("a DIFFERENT bucket count still answers right (one side exchanges)") {
    val a = java.nio.file.Files.createTempDirectory("bj").toString + "/a"
    val b = java.nio.file.Files.createTempDirectory("bj").toString + "/b"
    MergeInto.mergeBatch(spark,
      (0L until 100L).map(i => (i, s"s$i")).toDF("k", "s"),
      a, "k", numBuckets = 8)
    MergeInto.mergeBatch(spark,
      (0L until 100L).map(i => (i, i * 2)).toDF("k", "v"),
      b, "k", numBuckets = 4)
    noBroadcast {
      val joined = MergeInto.readTable(spark, a)
        .join(MergeInto.readTable(spark, b).drop("__bucket"), Seq("k"))
      assert(joined.count() == 100L)
    }
  }

  test("pre-stamp tables (no bucket ids in file names) fall back to the " +
      "plain scan — a wrong partitioning is never declared") {
    val a = java.nio.file.Files.createTempDirectory("bj").toString + "/a"
    MergeInto.mergeBatch(spark,
      (0L until 100L).map(i => (i, s"s$i")).toDF("k", "s"),
      a, "k", numBuckets = 4)
    // simulate a pre-round-8 table: strip the stamps from the file names
    val snap = ManifestStore.latest(spark, a).get
    val fs = new org.apache.hadoop.fs.Path(a)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    ManifestStore.resolvePaths(a, snap).foreach { dir =>
      fs.listStatus(new org.apache.hadoop.fs.Path(dir)).foreach { f =>
        val n = f.getPath.getName
        if (n.startsWith("part-")) {
          val stripped = n.replaceAll("_\\d{5}", "")
          assert(fs.rename(f.getPath, new org.apache.hadoop.fs.Path(
            f.getPath.getParent, stripped)))
        }
      }
    }
    // rewrite the recorded file-status names to the stripped ones too —
    // an old-layout table recorded its (unstamped) names truthfully; the
    // plain strip alone would violate the __fs: immutability contract
    val entries = snap.entries.map {
      case (k, v) if k.startsWith(ManifestStore.FileStatsPrefix) =>
        k -> v.replaceAll("_\\d{5}", "")
      case kv => kv
    }
    ManifestStore.commit(spark, a, snap.version + 1, entries)

    noBroadcast {
      val t = MergeInto.readTable(spark, a)
      val agg = t.groupBy(col("k")).agg(count(lit(1)))
      assert(exchanges(agg) >= 1,
        "an unstamped table must NOT claim a bucketed partitioning")
      assert(t.count() == 100L)
    }
  }

  test("the STREAMING stores join co-located too: a BucketedUpsert " +
      "current-state store and an Scd2Stream dimension each join a " +
      "same-bucketed merge table with ZERO shuffle") {
    val fact = java.nio.file.Files.createTempDirectory("bj").toString + "/f"
    MergeInto.mergeBatch(spark,
      (0L until 500L).map(i => (i, i * 10)).toDF("id", "v"),
      fact, "id", numBuckets = 8)

    // key-latest upsert store (two batches, second overwrites)
    val cur = java.nio.file.Files.createTempDirectory("bj").toString + "/c"
    BucketedUpsert.upsertBatch(spark,
      (0L until 500L).map(i => (i, s"old$i", i)).toDF("id", "s", "lsn"),
      cur, "id", "lsn", numBuckets = 8)
    BucketedUpsert.upsertBatch(spark,
      (0L until 500L by 5L).map(i => (i, s"new$i", i + 1000))
        .toDF("id", "s", "lsn"),
      cur, "id", "lsn", numBuckets = 8)

    // SCD2 dimension store (one upserted batch of open versions)
    val dim = java.nio.file.Files.createTempDirectory("bj").toString + "/d"
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    Scd2Stream.upsertBatch(spark,
      spark.createDataset((0L until 500L).map(i =>
        Scd2Stream.Version(i, Some(s"st$i"), Some(i * 1.0), t0,
          Scd2Stream.sentinel, closed = false, lsn = i))),
      dim, numBuckets = 8)

    noBroadcast {
      val j1 = ManifestStore.read(spark, cur).drop("__bucket")
        .join(MergeInto.readTable(spark, fact).drop("__bucket"), Seq("id"))
      assert(exchanges(j1) == 0,
        "upsert-store × merge-table key join must not shuffle")
      assert(j1.count() == 500L)
      assert(j1.filter(col("s").startsWith("new")).count() == 100L)

      val j2 = Scd2Stream.readDimension(spark, dim).toDF()
        .join(MergeInto.readTable(spark, fact).drop("__bucket"), Seq("id"))
      assert(exchanges(j2) == 0,
        "dimension × merge-table key join must not shuffle")
      assert(j2.count() == 500L)
    }
  }

  test("the point lookup and merge paths still work on stamped tables " +
      "(names changed, contract didn't)") {
    val a = java.nio.file.Files.createTempDirectory("bj").toString + "/a"
    MergeInto.mergeBatch(spark,
      (0L until 50L).map(i => (i, s"s$i")).toDF("k", "s"),
      a, "k", numBuckets = 4)
    MergeInto.mergeBatch(spark,
      Seq((7L, "SEVEN")).toDF("k", "s"), a, "k", numBuckets = 4)
    assert(MergeInto.lookupKey(spark, a, "k", 7L)
      .select("s").as[String].collect().toSeq == Seq("SEVEN"))
    assert(MergeInto.readTable(spark, a).count() == 50L)
  }
}
