package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.WordNGrams

class DecontamSpec extends SparkSpec {

  import spark.implicits._

  test("word_ngrams_all matches the composed transform/slice form") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog the quick brown fox",
      "  spaced   out\ttabs  ",
      "short",
      "a b c d e f g h",
      "a b c d e f g h i",
      "ünïcödé ẗëxt here and ünïcödé ẗëxt here again more tokens now",
      "dup dup dup dup dup dup dup dup dup dup"
    ).toDF("text")

    val composed = df.select(expr(
      """transform(sequence(1, greatest(size(split(lower(trim(text)),
        '\\s+')) - 7, 1)), i -> array_join(slice(split(lower(trim(text)),
        '\\s+'), i, 8), ' '))""").as("s"))
    val native = df.select(WordNGrams.all(col("text"), 8).as("s"))
    assert(native.collect().toSeq == composed.collect().toSeq)

    // positional count contract: max(tokens - n + 1, 1) windows per doc
    val counts = df.select(size(WordNGrams.all(col("text"), 8)).as("c"),
      greatest(size(split(lower(trim(col("text"))), "\\s+")) - 7, lit(1))
        .as("e")).collect()
    counts.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("dc1: only train docs reported, hits verified against a direct join") {
    val out = SparkEntry_dc1()
    assert(out.count() > 0)

    // no eval doc may appear
    val evalIds = Tables(spark, sfDir, "documents")
      .withColumn("b", graft.functions.Hash60(
        concat(lit("eval:"), col("doc_id").cast("string"))) % 100)
      .filter(col("b") < 10).select("doc_id").as[Long].collect().toSet
    val reported = out.select("doc_id").as[Long].collect()
    assert(reported.forall(!evalIds.contains(_)))

    // recompute n_hits for the reported docs with an independent
    // (unbroadcast, distinct-set intersect) formulation
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), WordNGrams(col("text"), 8).as("s"))
    val ev = docs.filter(col("doc_id").isInCollection(evalIds))
      .select(explode(col("s")).as("sh")).distinct()
      .as[String].collect().toSet
    val expected = docs.filter(!col("doc_id").isInCollection(evalIds))
      .select(col("doc_id"), col("s")).as[(Long, Seq[String])].collect()
      .map { case (id, s) => id -> s.count(ev.contains) }
      .filter(_._2 > 0).toMap
    val got = out.select("doc_id", "n_hits").as[(Long, Long)].collect()
      .map { case (id, h) => id -> h.toInt }.toMap
    assert(got == expected)
  }

  test("dd6: window counts and duplicated fraction are internally consistent") {
    val out = SparkEntry_dd6().cache()
    val n = Tables(spark, sfDir, "documents").count()
    assert(out.count() == n) // every doc reported, even 0-dup ones
    assert(out.filter(col("dup_windows") > col("n_windows")).count() == 0)
    assert(out.filter(col("dup_frac") < 0 || col("dup_frac") > 1).count() == 0)
    assert(out.filter(col("dup_windows") > 0).count() > 0)

    // n_windows equals the positional-window contract
    val exp = Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        greatest(graft.text.TextFunctions.tokenCount(col("text")) - 7,
          lit(1)).cast("long").as("e"))
    val bad = out.join(exp, "doc_id").filter(col("n_windows") =!= col("e"))
    assert(bad.count() == 0)
    out.unpersist()
  }

  test("cur5: per-source cap holds and ranks are contiguous from 1") {
    val out = CorpusQueries.queries("cur5_domain_cap")(spark, sfDir).cache()
    val per = out.groupBy("source")
      .agg(count(lit(1)).as("c"), min("rnk").as("lo"), max("rnk").as("hi"))
      .collect()
    per.foreach { r =>
      val c = r.getLong(1)
      assert(c <= DecontamQueries.DomainCap)
      assert(r.getLong(2) == 1L && r.getLong(3) == c)
    }
    // deterministic: a second run returns the identical set
    val again = CorpusQueries.queries("cur5_domain_cap")(spark, sfDir)
    assert(out.collect().toSeq == again.collect().toSeq)
    out.unpersist()
  }

  private def SparkEntry_dc1() =
    DecontamQueries.queries("dc1_decontam")(spark, sfDir)
  private def SparkEntry_dd6() =
    DecontamQueries.queries("dd6_passage_dups")(spark, sfDir)
}
