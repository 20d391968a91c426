package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 1
    (3L, "completely different content about spark engines"),
    (4L, "THE  quick brown fox jumps over the lazy dog"),  // exact dup of 1 (norm)
    (5L, "the quick brown fox jumps over the lazy dog")    // exact dup of 1
  ).toDF("doc_id", "text")

  test("exact duplicate groups keep the min id") {
    val g = Dedup.exactDuplicateGroups(docs, "text", "doc_id")
      .filter(col("n_copies") > 1).collect()
    assert(g.length == 1)
    assert(g.head.getAs[Long]("keep_id") == 1L)
    assert(g.head.getAs[Long]("n_copies") == 3L)

    val kept = Dedup.dropExactDuplicates(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L))
  }

  test("minhash near-dup pairs find the exact and near duplicates, not the distinct doc") {
    val pairs = Dedup.nearDuplicatePairs(docs, "text", "doc_id", tau = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // exact dups always pair; the one-word-changed doc pairs at tau=0.5
    assert(pairs.contains((1L, 4L)) && pairs.contains((1L, 5L))
      && pairs.contains((4L, 5L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("incremental drops equal the self-join pairs filtered to cross-split") {
    // small synthetic: store = {1,2,3}, batch = {4,5} (4,5 dup doc 1)
    val store = docs.filter(col("doc_id") <= 3)
    val batch = docs.filter(col("doc_id") > 3)
    val drops = Dedup.incrementalNearDupDrops(store, batch, "text", "doc_id",
        tau = 0.5).as[Long].collect().toSet
    assert(drops == Set(4L, 5L))

    // corpus-scale cross-check on real data: asymmetric join == self-join
    // pairs restricted to (store partner, batch member)
    val corpus = graft.ops.Tables(spark, sfDir, "documents")
    val st = corpus.filter(col("doc_id") % 10 < 7)
    val ba = corpus.filter(col("doc_id") % 10 >= 7)
    val asym = Dedup.incrementalNearDupDrops(st, ba, "text", "doc_id",
        tau = 0.8).as[Long].collect().toSet
    val pairs = Dedup.nearDuplicatePairs(corpus, "text", "doc_id", tau = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val expected = pairs.flatMap { case (a, b) =>
      (if (a % 10 < 7 && b % 10 >= 7) Seq(b) else Nil) ++
        (if (b % 10 < 7 && a % 10 >= 7) Seq(a) else Nil)
    }.toSet
    assert(asym == expected)
    assert(asym.nonEmpty)
  }

  test("containment catches a subset document that Jaccard misses") {
    val subsetDocs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon"),
      // doc 2 = a strict prefix of doc 1: containment 1.0, but its shingle
      // set is under half of doc 1's union → Jaccard < 0.5.
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "unrelated words entirely here nothing shared at all today")
    ).toDF("doc_id", "text")
    val contained = Dedup.containmentPairs(subsetDocs, "text", "doc_id",
        tau = 0.99, bands = 6, rowsPerBand = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val jacc = Dedup.nearDuplicatePairs(subsetDocs, "text", "doc_id",
        tau = 0.5, bands = 6, rowsPerBand = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(contained.contains((1L, 2L)))
    assert(!jacc.contains((1L, 2L)))
    assert(!contained.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: identical docs have hamming 0, near-dups small, distinct large") {
    val s = Dedup.simhashes(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s(1L) == s(4L) && s(1L) == s(5L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(s(1L), s(2L)) < ham(s(1L), s(3L)))
  }

  test("prefix-filter join equals the exact all-pairs Jaccard join") {
    // 40 docs with overlapping word runs → a mix of true pairs and misses;
    // the prefix join must reproduce brute force EXACTLY (no LSH tail)
    val corpus = (1L to 40L).map { i =>
      val words = (0 until 8).map(j => s"w${(i / 4 + j) % 13}")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val tau = 0.6
    val prefix = pairSet(Dedup.prefixJaccardPairs(corpus, "text", "doc_id", tau))
    // brute force: all pairs, exact jaccard on distinct 3-shingles
    val sets = corpus.select(col("doc_id"),
      array_distinct(graft.text.TextFunctions.shingles(col("text"), 3)).as("sh"))
    val brute = pairSet(sets.as("a").crossJoin(sets.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .withColumn("j", graft.text.TextFunctions.jaccard(col("a.sh"), col("b.sh")))
      .filter(col("j") >= tau)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b")))
    assert(prefix == brute, s"prefix join diverged from brute force")
    assert(brute.nonEmpty, "fixture produced no true pairs — test is vacuous")
  }

  test("prefix join: singleton and tiny sets don't crash and self-match is excluded") {
    val tiny = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x")).toDF("doc_id", "text")
    val pairs = Dedup.prefixJaccardPairs(tiny, "text", "doc_id", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("count-based exact join equals the prefix join and brute force") {
    val corpus = (1L to 40L).map { i =>
      val words = (0 until 8).map(j => s"w${(i / 4 + j) % 13}")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
        .collect().toSet
    for (tau <- Seq(0.3, 0.6, 0.9)) {
      val cnt = pairSet(Dedup.exactJaccardPairs(corpus, "text", "doc_id", tau))
      val pfx = pairSet(Dedup.prefixJaccardPairs(corpus, "text", "doc_id", tau))
      assert(cnt == pfx, s"tau=$tau: count-based diverged from prefix join")
    }
    assert(pairSet(
      Dedup.exactJaccardPairs(corpus, "text", "doc_id", 0.6)).nonEmpty)
  }

  test("universal hash family is deterministic and in range") {
    val fam = Dedup.hashFamily(12)
    assert(fam == Dedup.hashFamily(12))
    fam.foreach { case (a, b) =>
      assert(a > 0 && a < Dedup.HashPrime && b >= 0 && b < Dedup.HashPrime)
    }
  }
}
