package graft.model

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** LogReg: deterministic full-batch GD on the rational sigmoid. */
class LogRegSpec extends SparkSpec {

  private def sep = {
    // Balanced + margin-gapped: y = 1 iff x1 > x2, points within 0.2 of
    // the boundary removed (full-batch GD needs a visible margin).
    import spark.implicits._
    (1 to 200).flatMap { i =>
      val x1 = (i % 20) / 20.0
      val x2 = ((i * 7) % 20) / 20.0
      if (math.abs(x1 - x2) > 0.2)
        Some((i.toLong, x1, x2, if (x1 > x2) 1.0 else 0.0))
      else None
    }.toDF("id", "x1", "x2", "y")
  }

  test("learns a wide-margin separable rule perfectly") {
    val df = sep
    val w = LogReg.train(df, Seq("x1", "x2"), "y", iters = 8)
    val p = LogReg.fastSigmoid(LogReg.margin(w, Seq("x1", "x2")))
    val acc = df.select(
        avg(when((p >= 0.5).cast("int") === col("y").cast("int"), 1.0)
          .otherwise(0.0)))
      .head.getDouble(0)
    assert(acc == 1.0, s"accuracy $acc with weights ${w.toSeq}")
    // Direction: the learned hyperplane must weight x1 up and x2 down.
    assert(w(1) > 0 && w(2) < 0, w.toSeq.toString)
  }

  test("training is bit-deterministic across runs and partitionings") {
    val df = sep
    val w1 = LogReg.train(df, Seq("x1", "x2"), "y", iters = 4)
    val w2 = LogReg.train(df.repartition(7), Seq("x1", "x2"), "y", iters = 4)
    assert(w1.toSeq == w2.toSeq,
      "grid-quantized gradient sums must be partitioning-independent")
  }

  test("rejects a non-power-of-two learning rate") {
    intercept[IllegalArgumentException] {
      LogReg.train(sep, Seq("x1", "x2"), "y", iters = 1, lr = 3.0)
    }
  }

  test("fastSigmoid is monotone, bounded, and 0.5 at zero") {
    import spark.implicits._
    val zs = Seq(-100.0, -1.0, -0.25, 0.0, 0.25, 1.0, 100.0).toDF("z")
    val ps = zs.select(LogReg.fastSigmoid(col("z")).as("p"))
      .collect().map(_.getDouble(0)).toSeq
    assert(ps == ps.sorted, "monotone")
    assert(ps.forall(p => p > 0.0 && p < 1.0), "bounded in (0,1)")
    assert(ps(3) == 0.5, "sigma(0) = 0.5")
  }
}
