package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the greedy longest-match kernel against an independent reference
  * implementation on fuzzed words, through BOTH the interpreted eval and
  * the codegen path (whole rows through a DataFrame exercise codegen).
  */
class WordPieceCountSpec extends SparkSpec {

  private val pieces: Array[String] =
    ((('a' to 'z').map(_.toString) :+ "_") ++
      Seq("th", "the", "he", "er_", "in", "ing_", "qu", "tion_")).toArray

  /** Straightforward reference greedy — no sets, no early exits. */
  private def ref(word: String): Int = {
    val s = word + "_"
    var pos = 0
    var np = 0
    while (pos < s.length) {
      val m = pieces.filter(p => s.startsWith(p, pos))
      val step = if (m.isEmpty) 1 else m.map(_.length).max
      np += 1
      pos += step
    }
    np
  }

  test("kernel matches the reference greedy on fuzzed words (codegen path)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val words = Seq.tabulate(500)(_ =>
      Seq.fill(rnd.nextInt(12) + 1)(('a' + rnd.nextInt(26)).toChar)
        .mkString) ++
      Seq("the", "thing", "question", "a", "querying", "zzzz")
    val got = words.toDF("w")
      .select(col("w"), WordPieceCount(col("w"), pieces).as("np"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    words.foreach(w => assert(got(w) == ref(w), s"word=$w"))
  }

  test("longest match wins and the sentinel participates") {
    import spark.implicits._
    val got = Seq("the", "tin", "ting").toDF("w")
      .select(col("w"), WordPieceCount(col("w"), pieces).as("np"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got("the") == 2)  // "the" + "_"
    assert(got("tin") == 3)  // "t" + "in" + "_"
    assert(got("ting") == 2) // "t" + "ing_" — the sentinel merged piece
  }
}
