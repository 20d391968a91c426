package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  /** 200 points stretched 10× along a fixed direction w plus small
    * deterministic off-axis wiggle: the top component must align with w.
    */
  private def fixture(dim: Int) = {
    val w = Array.tabulate(dim)(i => if (i % 3 == 0) 0.6 else -0.4)
    val nw = math.sqrt(w.map(x => x * x).sum)
    val wn = w.map(_ / nw)
    val rows = (0 until 200).map { i =>
      val t = (i % 21) - 10.0 // dominant axis, range ±10
      val vec = Array.tabulate(dim) { d =>
        (t * wn(d) + 0.05 * math.sin(i * (d + 1))).toFloat
      }
      (i.toLong, vec.toSeq)
    }
    (rows.toDF("id", "vec"), wn)
  }

  test("power iteration recovers the dominant direction") {
    val (df, wn) = fixture(16)
    val (_, v) = Pca.topComponent(df, "vec", 16, iters = 4)
    val cos = v.zip(wn).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.99, s"|cos(v, w)| = ${math.abs(cos)}")
    val n = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(n - 1.0) < 1e-9, s"component not unit: $n")
  }

  test("training and projections are bit-deterministic across runs") {
    val (df, _) = fixture(16)
    val (m1, v1) = Pca.topComponent(df, "vec", 16)
    val (m2, v2) = Pca.topComponent(df, "vec", 16)
    assert(m1.toSeq == m2.toSeq && v1.toSeq == v2.toSeq)
    val p1 = Pca.projections(df, "id", "vec", m1, v1)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    val p2 = Pca.projections(df, "id", "vec", m2, v2)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(p1 == p2)
    // projections are centered: grid-exact sums make this near-zero, and
    // the mean projection must be tiny relative to the ±10 spread
    assert(math.abs(p1.map(_._2).sum / p1.size) < 1e-3)
  }

  test("zero-variance input keeps the seed direction (no NaN)") {
    val df = (0 until 8).map(i => (i.toLong, Seq.fill(4)(1.0f))).toDF("id", "vec")
    val (_, v) = Pca.topComponent(df, "vec", 4)
    assert(v.forall(x => !x.isNaN))
    assert(v.toSeq == Seq.fill(4)(0.5))
  }
}
