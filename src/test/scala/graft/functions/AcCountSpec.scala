package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AcCountSpec extends SparkSpec {

  import spark.implicits._

  /** Naive reference: all (possibly overlapping) occurrences of `t`. */
  private def naive(s: String, t: String): Long =
    (0 to s.length - t.length).count(i => s.startsWith(t, i)).toLong

  private def borderFree(t: String): Boolean =
    (1 until t.length).forall(b =>
      t.substring(0, b) != t.substring(t.length - b))

  test("known counts, nested terms, phrases") {
    val terms = Seq("ab", "abc", "b c", "c")
    val got = Seq("xabcab b c abc")
      .toDF("text")
      .select(AcCount(col("text"), terms).as("c"))
      .as[Seq[Long]].head()
    val s = "xabcab b c abc"
    assert(got == terms.map(t => naive(s, t)), s"got $got")
  }

  test("fuzz: automaton equals the naive scan on random small-alphabet " +
    "strings") {
    val rnd = new scala.util.Random(42)
    def randStr(n: Int) = Seq.fill(n)("abcd ".charAt(rnd.nextInt(5))).mkString
    val terms = Iterator.continually(randStr(1 + rnd.nextInt(4)))
      .filter(t => t.trim == t && t.nonEmpty && borderFree(t))
      .distinct.take(12).toSeq
    val texts = Seq.fill(200)(randStr(5 + rnd.nextInt(60)))
    val got = texts.toDF("text")
      .select(col("text"), AcCount(col("text"), terms).as("c"))
      .as[(String, Seq[Long])].collect()
    got.foreach { case (s, counts) =>
      assert(counts == terms.map(t => naive(s, t)),
        s"mismatch on '$s': $counts vs ${terms.map(t => naive(s, t))}")
    }
  }

  test("bordered terms are rejected loudly") {
    val err = intercept[Exception] {
      Seq("x").toDF("text")
        .select(AcCount(col("text"), Seq("aba")).as("c")).collect()
    }
    assert(err.getMessage.contains("border"))
  }

  test("empty text and no-match text count zero") {
    val got = Seq("", "zzzz").toDF("text")
      .select(AcCount(col("text"), Seq("ab", "cd")).as("c"))
      .as[Seq[Long]].collect().toSeq
    assert(got == Seq(Seq(0L, 0L), Seq(0L, 0L)))
  }
}
