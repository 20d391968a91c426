package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.Scd2Stream.{Change, Version}

class DimensionUpsertSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)
  private def chg(id: Long, st: String, lsn: Long, t: Long) =
    Change(id, Option(st), Some(lsn * 1.0), "UPDATE", lsn, ts(t))

  test("dimensionStream maintains an upserted parquet SCD2 dimension") {
    val base = Files.createTempDirectory("graft-dim").toString
    val dim = s"$base/dim"
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Change]
    val q = Scd2Stream.dimensionStream(input.toDS(), dim, s"$base/ckpt")

    input.addData(chg(1, "a", 1, 10), chg(1, "b", 2, 20))
    q.processAllAvailable()
    val after1 = spark.read.parquet(dim).as[Version].collect()
    assert(after1.length == 2)
    assert(after1.count(!_.closed) == 1)
    assert(after1.find(!_.closed).get.status.contains("b"))

    input.addData(chg(1, "c", 3, 30), chg(2, "x", 1, 15))
    q.processAllAvailable()
    q.stop()
    val after2 = spark.read.parquet(dim).as[Version].collect()
    // key 1: a(closed), b(closed, upserted over the open b), c(open);
    // key 2: x(open)
    assert(after2.length == 4)
    assert(after2.count(!_.closed) == 2)
    val bRow = after2.find(v => v.status.contains("b")).get
    assert(bRow.closed &&
      bRow.row_valid_expiration_timestamp == ts(30))
  }
}
