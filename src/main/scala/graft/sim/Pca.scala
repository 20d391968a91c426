package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Top principal component by distributed POWER ITERATION — the
  * embedding-space analysis primitive (dominant direction of variance,
  * whitening, spectral outlier scoring) a training-data pipeline wants
  * before/after dedup. Everything is engine-exact so a sequential SQL
  * engine re-derives the identical component:
  *
  *   - the per-dimension mean sums grid-quantized components
  *     (`floor(x·G)/G`) — an exact dyadic sum in any order;
  *   - each iteration's matrix-vector product `u = Xᶜᵀ(Xᶜ v)` is two
  *     grid-quantized passes: per-row projections via the order-independent
  *     [[graft.functions.DotProduct.grid]] kernel minus the (exact)
  *     mean·v scalar, then per-dimension sums of
  *     `floor((x−m)·p · G)/G`;
  *   - normalization divides by `sqrt(Σ floor(u²·G)/G)` — floor, multiply,
  *     divide and sqrt are all correctly rounded IEEE ops, so no libm
  *     variance leaks in.
  *
  * Scale shape: per iteration ONE corpus scan (scan-side projection with
  * the current component as an O(dim) plan literal) feeding a
  * dim-group hash aggregation — no corpus shuffle, no window; driver state
  * is two dim-length vectors. Grid sums stay exact while
  * `|Σ| < 2^33` (≈8e9 unit-scale contributions); coarsen `Grid` before a
  * corpus ever crosses that, as with `Similarity.CentroidGrid`.
  */
object Pca {

  val Grid = 1048576L

  /** (mean, component) after `iters` power rounds from the deterministic
    * `1/√dim` seed. Empty or zero-variance input keeps the seed direction.
    */
  def topComponent(corpus: DataFrame, vecCol: String, dim: Int,
                   iters: Int = 3): (Array[Double], Array[Double]) = {
    val g = Grid.toDouble
    val vec = col(vecCol).cast("array<double>")
    val n = corpus.count().toDouble
    val mean = Array.ofDim[Double](dim)
    corpus.select(posexplode(vec).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(sum(floor(col("x") * g) / g).as("s"))
      .collect().foreach(r => mean(r.getInt(0)) = r.getDouble(1) / n)

    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    for (_ <- 1 to iters) {
      val u = step(corpus, vecCol, mean, v)
      val s = u.map(x => math.floor(x * x * g) / g).sum // exact dyadic sum
      if (s > 0) {
        val nrm = math.sqrt(s)
        v = u.map(_ / nrm)
      }
    }
    (mean, v)
  }

  /** One un-normalized power step `u = Xᶜᵀ(Xᶜ v)`, grid-exact. */
  private def step(corpus: DataFrame, vecCol: String,
                   mean: Array[Double], v: Array[Double]): Array[Double] = {
    val g = Grid.toDouble
    val dim = v.length
    val vec = col(vecCol).cast("array<double>")
    val mLit = typedlit(mean.toSeq)
    val vLit = typedlit(v.toSeq)
    val mdotv = gridDot(mean, v)
    val u = Array.ofDim[Double](dim)
    corpus
      .select((graft.functions.DotProduct.grid(vec, vLit, Grid) - lit(mdotv))
        .as("p"), vec.as("vd"))
      .select(col("p"), posexplode(col("vd")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(sum(floor((col("x") - element_at(mLit, col("pos") + 1))
        * col("p") * g) / g).as("u"))
      .collect().foreach(r => u(r.getInt(0)) = r.getDouble(1))
    u
  }

  /** Per-row projections onto the final component: `(id, proj)` with
    * `proj = Σ floor(x·v·G)/G − Σ floor(m·v·G)/G` — the same
    * order-independent arithmetic the training passes used.
    */
  def projections(corpus: DataFrame, idCol: String, vecCol: String,
                  mean: Array[Double], v: Array[Double]): DataFrame = {
    val vec = col(vecCol).cast("array<double>")
    val vLit = typedlit(v.toSeq)
    corpus.select(col(idCol),
      (graft.functions.DotProduct.grid(vec, vLit, Grid) -
        lit(gridDot(mean, v))).as("proj"))
  }

  /** Driver-side `Σ floor(a·b·G)/G` — exact, so order is irrelevant. */
  private def gridDot(a: Array[Double], b: Array[Double]): Double = {
    val g = Grid.toDouble
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += math.floor(a(i) * b(i) * g) / g; i += 1 }
    acc
  }
}
