package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the rolling-hash kernel against a direct per-window Horner
  * recompute (the oracle's algorithm) on fuzzed strings — including
  * non-ASCII, where code POINTS (not UTF-16 units) must window.
  */
class CdcBoundariesSpec extends SparkSpec {

  private def direct(s: String, w: Int, divisor: Int): Int = {
    val cps = s.codePoints().toArray
    (w to cps.length).count { i =>
      val h = cps.slice(i - w, i).foldLeft(0L)((a, c) =>
        (a * CdcBoundaries.B + c) % CdcBoundaries.M)
      h % divisor == 0
    }
  }

  test("rolling equals direct Horner on fuzzed strings (codegen path)") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    // whole code points (a char-indexed alphabet would split the emoji's
    // surrogate pair, and lone surrogates don't survive the UTF-8
    // round-trip into UTF8String)
    val alphabet = Vector("a", "b", "c", "d", "e", "f", "g", "h", " ",
      "0", "1", "2", "3", "口", "語", "😀", "é")
    val words = Seq.tabulate(300)(_ =>
      Seq.fill(rnd.nextInt(200))(
        alphabet(rnd.nextInt(alphabet.length))).mkString) ++
      Seq("", "short", "x" * 16, "y" * 15)
    val got = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "t")
      .select(col("id"), CdcBoundaries(col("t"), 16, 64).as("nb"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    words.zipWithIndex.foreach { case (w, i) =>
      assert(got(i.toLong) == direct(w, 16, 64), s"word $i")
    }
  }

  test("cdc_boundaries is SQL-callable; an edit moves only local " +
      "boundaries (the content-defined property)") {
    val r = spark.sql(
      "SELECT cdc_boundaries('the quick brown fox jumps over it', 16, 4)")
      .collect().head
    assert(r.getInt(0) == direct("the quick brown fox jumps over it", 16, 4))
    // stability: appending a suffix never changes boundary decisions in
    // the untouched prefix (each decision sees only its trailing window)
    val base = "a" * 50 + "bcdefghij" * 10
    val edited = base + " trailing edit"
    val nbBase = CdcBoundaries.count(
      org.apache.spark.unsafe.types.UTF8String.fromString(base), 16, 4)
    val nbEdit = CdcBoundaries.count(
      org.apache.spark.unsafe.types.UTF8String.fromString(edited), 16, 4)
    assert(nbEdit >= nbBase) // prefix boundaries all survive
  }
}
