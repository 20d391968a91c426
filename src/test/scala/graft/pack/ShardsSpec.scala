package graft.pack

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.ManifestStore

/** Shard emission invariants: the union of shards is exactly the corpus,
  * assignment is stable and balanced, and publication is one atomic
  * manifest commit.
  */
class ShardsSpec extends SparkSpec {

  import spark.implicits._

  test("write publishes balanced shards whose union is exactly the corpus") {
    val root = java.nio.file.Files.createTempDirectory("shards").toString + "/s"
    val docs = spark.range(0, 1000).toDF("doc_id")
      .withColumn("payload", col("doc_id") * 3)
    Shards.write(spark, docs, root, "doc_id", nShards = 8)

    val snap = ManifestStore.latest(spark, root).get
    val shardIds = snap.entries.keys
      .filterNot(graft.streaming.ManifestStore.isMetaSlot)
      .map(_.toInt).toSeq.sorted
    assert(shardIds == (0 until 8))

    val all = shardIds.flatMap(sd =>
      Shards.readShard(spark, root, sd).select("doc_id").as[Long].collect())
    assert(all.sorted == (0L until 1000L))

    // balance: expected 125/shard, O(sqrt) deviation — generous 3-sigma
    val sizes = shardIds.map(sd => Shards.readShard(spark, root, sd).count())
    assert(sizes.forall(s => s > 85 && s < 165), s"imbalanced: $sizes")

    // assignment is a pure function of the id (re-run stable)
    val a1 = Shards.assign(docs, "doc_id", 8)
      .select("doc_id", "__shard").as[(Long, Long)].collect().toMap
    val a2 = Shards.assign(docs.orderBy(rand(7)), "doc_id", 8)
      .select("doc_id", "__shard").as[(Long, Long)].collect().toMap
    assert(a1 == a2)
  }
}
