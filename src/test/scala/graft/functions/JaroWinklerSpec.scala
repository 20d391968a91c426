package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the jaro_winkler kernel: known literature values, edge semantics
  * matching DuckDB's `jaro_winkler_similarity` (either side empty → 0.0),
  * symmetry, bounds, and a seeded fuzz against an independent scalar
  * reference implementation (the kernel's codegen path must agree with
  * interpreted eval and with the naive algorithm on every pair).
  */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinkler.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("literature values") {
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("abc", "xyz") == 0.0)
  }

  test("edge semantics match DuckDB: empty strings score 0") {
    assert(jw("", "") == 0.0)
    assert(jw("a", "") == 0.0)
    assert(jw("", "a") == 0.0)
  }

  test("symmetric and bounded on a seeded fuzz; codegen agrees with eval") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(400) {
      def s() = (0 until rnd.nextInt(9)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      (s(), s())
    }
    // scalar reference: the naive textbook algorithm, written independently
    def ref(s1: String, s2: String): Double = {
      val l1 = s1.length; val l2 = s2.length
      if (l1 == 0 || l2 == 0) return 0.0
      val w = math.max(0, math.max(l1, l2) / 2 - 1)
      val used = Array.fill(l2)(false)
      val matchedIdx = scala.collection.mutable.ArrayBuffer[Int]()
      val matched1 = scala.collection.mutable.ArrayBuffer[Char]()
      for (i <- 0 until l1) {
        val j = (math.max(0, i - w) until math.min(l2, i + w + 1))
          .find(j => !used(j) && s1(i) == s2(j))
        j.foreach { jj => used(jj) = true; matchedIdx += jj; matched1 += s1(i) }
      }
      val m = matched1.size
      if (m == 0) return 0.0
      val s2m = matchedIdx.sorted.map(s2(_))
      val t = matched1.zip(s2m).count { case (a, b) => a != b } / 2
      val j = (m.toDouble / l1 + m.toDouble / l2 + (m.toDouble - t) / m) / 3.0
      if (j > 0.7) {
        val p = s1.zip(s2).take(4).takeWhile { case (a, b) => a == b }.size
        j + 0.1 * p * (1.0 - j)
      } else j
    }
    pairs.foreach { case (a, b) =>
      val k = jw(a, b)
      assert(k == jw(b, a), s"asymmetric on ($a, $b)")
      assert(k >= 0.0 && k <= 1.0)
      assert(k == ref(a, b), s"kernel ${k} != ref ${ref(a, b)} on ($a, $b)")
    }
    // codegen path (project over a DataFrame) agrees with direct eval
    import spark.implicits._
    val df = pairs.toDF("a", "b")
      .select(col("a"), col("b"), JaroWinkler(col("a"), col("b")).as("k"))
    df.collect().foreach { r =>
      assert(r.getDouble(2) == jw(r.getString(0), r.getString(1)))
    }
  }
}
