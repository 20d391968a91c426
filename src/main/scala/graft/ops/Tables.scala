package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-provided parquet tables (`/root/repo/TESTDATA.md`). */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
