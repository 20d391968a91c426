package graft

import org.apache.spark.sql.SparkSession

/** Library front door: a SparkSession wired the way the engine expects —
  * graft's native SQL functions registered, UTC session time, AQE on
  * (Spark 4 default, pinned here explicitly), and shuffle parallelism sized
  * to the actual core count instead of the 200 default.
  */
object GraftSession {

  def builder(master: String = "local[*]",
              shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val parts = shufflePartitions.getOrElse(
      Runtime.getRuntime.availableProcessors())
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // sort shuffle writer, never bypass-merge: below 200 reduce
      // partitions the bypass writer creates one file per partition per
      // map task — an O(M×R) creation storm that dominates on
      // latency-bound filesystems (object stores, contended local
      // disks); above 200 Spark takes the sort path anyway, so this
      // removes the small-count special case
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .withExtensions(new functions.GraftExtensions)
  }

  /** S3-compatible object-store access (SURVEY §2 S6) — the Hadoop-conf
    * mirror of the reference's DuckDB `SET s3_*` block (reference
    * `example/duckdb_minio_product_scd2.sql:2-11`): explicit endpoint,
    * path-style addressing, static credentials, optional plain HTTP — the
    * MinIO/on-prem shape. Call once per session; all `s3a://` paths
    * (lake reads, [[streaming.Landing.landingSink]] targets,
    * [[streaming.ForeignLake]] roots) then resolve through it. Needs the
    * `hadoop-aws` + AWS SDK jars on the cluster classpath (not in this
    * harness — conf wiring is unit-tested, the network path is not).
    */
  def withS3a(spark: SparkSession, endpoint: String, accessKey: String,
              secretKey: String, pathStyle: Boolean = true,
              ssl: Boolean = false): SparkSession = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.s3a.endpoint", endpoint)
    hc.set("fs.s3a.access.key", accessKey)
    hc.set("fs.s3a.secret.key", secretKey)
    hc.set("fs.s3a.path.style.access", pathStyle.toString)
    hc.set("fs.s3a.connection.ssl.enabled", ssl.toString)
    spark
  }
}
