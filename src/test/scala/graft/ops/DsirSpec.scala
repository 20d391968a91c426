package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic checks for the DSIR importance-resampling gate: the whole point
  * of the log-ratio weight is that target-like (here: English) documents
  * score higher, so the top-N selection should be dominated by the target
  * slice even though lang never feeds the per-doc score directly (only the
  * hashed token distributions do).
  */
class DsirSpec extends SparkSpec {

  import spark.implicits._

  private lazy val out =
    CorpusQueries.queries("cur11_dsir_sample")(spark, sfDir)
      .join(Tables(spark, sfDir, "documents").select("doc_id", "lang"),
        Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("avg_log_ratio"),
        col("selected"))
      .as[(Long, String, Double, Int)].collect().toSeq

  test("every document is scored exactly once; exactly N are selected") {
    assert(out.map(_._1).distinct.size == out.size)
    assert(out.count(_._4 == 1) == 100)
  }

  test("target-language documents outscore the rest on average") {
    val en = out.filter(_._2 == "en").map(_._3)
    val other = out.filter(_._2 != "en").map(_._3)
    assert(en.nonEmpty && other.nonEmpty)
    assert(en.sum / en.size > other.sum / other.size,
      "mean log-ratio must separate the target slice")
  }

  test("the selected set is dominated by the target language") {
    val sel = out.filter(_._4 == 1)
    val enFrac = sel.count(_._2 == "en").toDouble / sel.size
    // at sf0.001 'en' is ~44% of the corpus; importance selection should
    // concentrate it well past its base rate
    assert(enFrac >= 0.7, s"selected en fraction $enFrac < 0.7")
  }

  test("selection is deterministic across runs") {
    val again = CorpusQueries.queries("cur11_dsir_sample")(spark, sfDir)
      .filter(col("selected") === 1)
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.filter(_._4 == 1).map(_._1).toSet)
  }
}
