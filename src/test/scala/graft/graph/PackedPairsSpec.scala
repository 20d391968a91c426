package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackedPairsSpec extends SparkSpec {

  import spark.implicits._

  test("pack/unpack roundtrip across the id range, including the edges") {
    val ids = Seq(0L, 1L, 2L, 1000L, (1L << 20) + 3L,
      PackedPairs.IdCap - 2, PackedPairs.IdCap - 1)
    val pairs = for (u <- ids; v <- ids) yield (u, v)
    val got = pairs.toDF("u", "v")
      .select(col("u"), col("v"),
        PackedPairs.pack(col("u"), col("v")).as("pr"))
      .select(col("u"), col("v"),
        PackedPairs.hi(col("pr")).as("hu"), PackedPairs.lo(col("pr")).as("lv"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(0) == r.getLong(2) && r.getLong(1) == r.getLong(3))
    }
  }

  test("packed key order is the (u, v) lexicographic order") {
    val rnd = new scala.util.Random(5)
    val pairs = (1 to 2000).map { _ =>
      (rnd.nextLong(PackedPairs.IdCap), rnd.nextLong(PackedPairs.IdCap))
    }
    val byPair = pairs.sorted
    val byKey = pairs.sortBy { case (u, v) => (u << 32) | v }
    assert(byPair == byKey)
  }

  test("fits gates exactly the packable range") {
    assert(PackedPairs.fits(0L, PackedPairs.IdCap - 1))
    assert(!PackedPairs.fits(0L, PackedPairs.IdCap))
    assert(!PackedPairs.fits(-1L, 10L))
  }

  test("packed pair aggregation == two-column pair aggregation (wedge shape)") {
    // the q103/q110/q136 shape: sorted per-group arrays, tail-slice pair
    // enumeration, then a keyed aggregation — the packed single-long key
    // must produce the same groups, sums and tie-broken ordering
    val rnd = new scala.util.Random(17)
    val edges = (1 to 4000).map { _ =>
      (rnd.nextInt(300).toLong, rnd.nextInt(90).toLong)
    }.distinct.toDF("p", "c")
    val grouped = edges.groupBy(col("p"))
      .agg(sort_array(collect_list(col("c"))).as("cs"))
    val pairs = grouped
      .select(posexplode(col("cs")).as(Seq("i", "c1")), col("cs"))
      .select(col("c1"), explode(
        slice(col("cs"), col("i") + 2, size(col("cs")))).as("c2"))
    val plain = pairs.groupBy(col("c1"), col("c2"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("c1"), col("c2")).limit(50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val packed = pairs
      .select(PackedPairs.pack(col("c1"), col("c2")).as("pr"))
      .groupBy(col("pr")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pr")).limit(50)
      .select(PackedPairs.hi(col("pr")).as("c1"),
        PackedPairs.lo(col("pr")).as("c2"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(packed.toSeq == plain.toSeq)
  }
}
