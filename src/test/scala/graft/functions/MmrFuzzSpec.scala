package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property pin for the MmrSelect kernel: on seeded random candidate
  * arrays, the kernel's picks must equal a straightforward Scala greedy
  * reference (same λ=1/2 combination, same (score desc, cid asc) ties,
  * same incremental max-sim) — catching index/ordering bugs the
  * fixture-shaped MmrSpec cannot.
  */
class MmrFuzzSpec extends SparkSpec {

  import spark.implicits._

  private def refGreedy(c: Seq[(Long, Double, Array[Float], Double)],
      k: Int): Seq[(Int, Long, Double)] = {
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val taken = Array.fill(c.length)(false)
    val maxSim = Array.fill(c.length)(0.0)
    val out = Seq.newBuilder[(Int, Long, Double)]
    for (step <- 0 until math.min(k, c.length)) {
      var best = -1; var bestScore = 0.0
      for (j <- c.indices if !taken(j)) {
        val score =
          if (step == 0) 0.5 * c(j)._2
          else 0.5 * c(j)._2 - 0.5 * maxSim(j)
        if (best < 0 || score > bestScore ||
            (score == bestScore && c(j)._1 < c(best)._1)) {
          best = j; bestScore = score
        }
      }
      taken(best) = true
      out += ((step + 1, c(best)._1, bestScore))
      for (j <- c.indices if !taken(j)) {
        val s = dot(c(j)._3, c(best)._3) / (c(j)._4 * c(best)._4)
        if (step == 0 || s > maxSim(j)) maxSim(j) = s
      }
    }
    out.result()
  }

  test("kernel picks equal the Scala reference greedy on random inputs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 20) {
      val m = 1 + rnd.nextInt(24)
      val dim = 1 + rnd.nextInt(8)
      val cands = (0 until m).map { i =>
        val v = Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
        // guarantee a nonzero norm
        v(0) = (math.abs(v(0)) + 0.1).toFloat
        val n = math.sqrt(v.map(x => x.toDouble * x).sum)
        (i.toLong * 3 + 1, rnd.nextDouble() * 2 - 1, v, n)
      }
      val k = 1 + rnd.nextInt(m + 3) // sometimes k > m
      val df = Seq(Tuple1(cands.map(c => (c._1, c._2, c._3.toSeq, c._4))))
        .toDF("cands")
        .select(col("cands").cast(
          "array<struct<cid:bigint,cos:double,cv:array<float>,cn:double>>")
          .as("cands"))
      val got = df.select(explode(MmrSelect(col("cands"), k)).as("p"))
        .select(col("p.pick"), col("p.cid"), col("p.score"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got === refGreedy(cands, k), s"trial $trial (m=$m, k=$k)")
    }
  }
}
