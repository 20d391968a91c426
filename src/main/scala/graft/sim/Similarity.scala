package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Numeric contract: every reduction is a sequential left fold over doubles
  * (`aggregate(zip_with(...))`) so results are bit-identical to any engine
  * folding the same element order — the DuckDB oracles use
  * `list_reduce(..., (a,b) -> a+b)` over the same products.
  *
  * Scale shape:
  *   - brute-force top-k is the exactness baseline: broadcast the (small)
  *     query set against the corpus — corpus never shuffles, a per-query
  *     window takes the top k;
  *   - the LSH path buckets the corpus by sign-bit hyperplane hashes
  *     (deterministic ±1 planes), so candidate generation is a bucket
  *     equi-join — the 100 TB corpus is scanned once, hashed once, and only
  *     same-bucket vectors are compared.
  */
object Similarity {

  /** Elementwise-product sequential sum: dot(a, b) as double, via the
    * native codegen'd [[graft.functions.DotProductExpr]] — same sequential
    * accumulation a `aggregate(zip_with(...))` fold computes, minus the
    * interpreted-path dispatch and per-pair intermediate array.
    */
  def dot(a: Column, b: Column): Column = graft.functions.DotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; the `sqrt(na)*sqrt(nb)` shape (not `sqrt(na*nb)`)
    * is mirrored in the oracle SQL.
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k nearest corpus vectors per query vector by cosine.
    *
    * `queries` and `corpus`: (id, vec). The query side is expected small and
    * is broadcast; ties break on corpus id for determinism. The
    * `row_number() <= k` filter is planned as WindowGroupLimit (verified in
    * the physical plan): Spark keeps a bounded per-partition top-k heap
    * BEFORE the shuffle and again after — the corpus is never globally
    * sorted, so this scales to arbitrary corpus size.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // Norms are projected per ROW below the join (n + q sqrt-folds), so the
    // per-PAIR work is a single dot fold — identical values, 3× less work
    // where it multiplies (same `sqrt(na)*sqrt(nb)` shape as the oracle).
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"),
      norm(col("vec")).as("qn"))
    val c = corpus.select(col("id").as("corpus_id"), col("vec").as("cv"),
      norm(col("vec")).as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cos"), col("rank"))
  }

  /** RANGE (radius) search: every corpus vector with cosine ≥ `tau` to
    * each query — the retrieval primitive top-k cannot express when the
    * answer-set size is unknown up front (near-neighbor audits, dedup
    * candidate pulls, recall studies). Scale shape: the query set
    * broadcasts against ONE corpus scan and the threshold filters
    * scan-side — no window, no shuffle of the corpus at all; the only
    * data-dependent cost is the survivors themselves. Cosines are the
    * module's sequential-fold kernels, bit-exact with the DuckDB mirror.
    */
  def rangeSearch(queries: DataFrame, corpus: DataFrame,
      tau: Double): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"),
      norm(col("vec")).as("qn"))
    val c = corpus.select(col("id").as("corpus_id"), col("vec").as("cv"),
      norm(col("vec")).as("cn"))
    c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .filter(col("cos") >= tau)
      .select(col("query_id"), col("corpus_id"), col("cos"))
  }

  /** MMR (maximal-marginal-relevance) DIVERSIFIED top-k: greedily pick k
    * results trading off query relevance against redundancy with what is
    * already picked — score(d) = λ·cos(q,d) − (1−λ)·max_{s∈S} cos(d,s).
    * The retrieval-diversification / coverage-sampling primitive (RAG
    * result lists, exemplar selection for curation) that plain top-k
    * cannot express: near-duplicate hits crowd out coverage.
    *
    * Scale shape: relevance is ONE [[bruteForceTopK]] pass (corpus
    * scanned once, WindowGroupLimit bounded) producing an m-row shortlist
    * per query; the greedy loop then runs entirely on the BOUNDED
    * per-query candidate array (collect_list of m rows — never the
    * corpus) as k unrolled scan-side HOF steps, so the sequential part is
    * O(k·m·|S|) arithmetic per query row, zero extra shuffles.
    *
    * Cross-engine exactness: λ = 0.5 makes the combination two exact
    * IEEE multiply-subtracts over cosines that are themselves sequential
    * folds (the module contract), and every argmax breaks ties on lower
    * corpus id via struct ordering — the DuckDB oracle replays the same
    * k greedy steps relationally and lands on identical bits.
    */
  def mmrTopK(queries: DataFrame, corpus: DataFrame, m: Int,
      k: Int): DataFrame = {
    require(m >= k, s"shortlist m=$m must be >= k=$k")
    val short = bruteForceTopK(queries, corpus, m)
    val c = corpus.select(col("id").as("corpus_id"), col("vec").as("cv"),
      norm(col("vec")).as("cn"))
    // bounded per-query candidate array (m rows) — the greedy loop is the
    // graft.functions.MmrSelect kernel: O(k·m) primitive arithmetic per
    // query row, order-independent input (every argmax totally ordered),
    // inside whole-stage codegen. The first HOF formulation of this loop
    // re-inlined each step's tree at every reference and went exponential
    // in k — see the kernel scaladoc.
    val packed = short.join(c, "corpus_id")
      .groupBy(col("query_id"))
      .agg(collect_list(struct(col("corpus_id").as("cid"),
        col("cos"), col("cv"), col("cn"))).as("cands"))
    packed
      .select(col("query_id"),
        explode(graft.functions.MmrSelect(col("cands"), k)).as("p"))
      .select(col("query_id"), col("p.cid").as("corpus_id"),
        col("p.score").as("mmr_score"), col("p.pick").as("pick_rank"))
  }

  /** Hard-negative mining for contrastive training: per query, the top-k
    * most-similar corpus vectors carrying a DIFFERENT label — the
    * highest-loss negatives a triplet/InfoNCE trainer wants. Same scale
    * shape as [[bruteForceTopK]] (broadcast query set, corpus scanned once,
    * WindowGroupLimit bounded top-k); the label inequality is evaluated
    * BELOW the score so mismatched pairs never rank.
    *
    * `queries` and `corpus`: (id, vec, label).
    */
  /** FILTERED (tenant-scoped) exact top-k: each query ranks ONLY corpus
    * vectors carrying the SAME label — the metadata-filtered vector
    * search every multi-tenant / per-collection index serves (and the
    * mirror of [[hardNegativeTopK]]'s cross-label restriction). The
    * predicate is evaluated BELOW the score, so excluded rows never pay
    * a dot product; scale shape otherwise identical to
    * [[bruteForceTopK]] (broadcast queries, WindowGroupLimit top-k; at
    * index scale the same filter drops into the IVF/PQ candidate walk).
    */
  def sameLabelTopK(queries: DataFrame, corpus: DataFrame,
      k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"),
      col("label").as("query_label"), col("vec").as("qv"),
      norm(col("vec")).as("qn"))
    val c = corpus.select(col("id").as("corpus_id"),
      col("label").as("corpus_label"), col("vec").as("cv"),
      norm(col("vec")).as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("corpus_label") === col("query_label") &&
        col("query_id") =!= col("corpus_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("query_label"), col("corpus_id"),
        col("cos"), col("rank"))
  }

  def hardNegativeTopK(queries: DataFrame, corpus: DataFrame,
      k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"),
      col("label").as("query_label"), col("vec").as("qv"),
      norm(col("vec")).as("qn"))
    val c = corpus.select(col("id").as("corpus_id"),
      col("label").as("neg_label"), col("vec").as("cv"),
      norm(col("vec")).as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neg_label") =!= col("query_label"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("query_label"), col("corpus_id"),
        col("neg_label"), col("cos"), col("rank"))
  }

  /** Auto-sizing for the ANN recall/cost dial. The round-3 measurement
    * behind these (driver embeddings, the unclustered WORST case for ANN):
    * fixed 256 centroids / 2 probes on a 2k corpus gave recall@5 = 0.26 —
    * mis-sized cells, not a bad algorithm. sqrt-sized cells with a ~1/8
    * probe fraction measured 0.56–0.72 at LOWER per-query cost (fewer,
    * fuller cells amortize the centroid pass). Defaults target recall
    * ≥ 0.5 on unclustered data; clustered real-world corpora reach that
    * far cheaper — callers tuning for throughput can pass an explicit
    * `nProbe` down to ~numCentroids/64.
    */
  private[sim] def autoCentroids(n: Long, cap: Int): Int =
    math.max(16, math.min(cap, math.ceil(math.sqrt(n.toDouble)).toInt))

  /** Probe HALF the cells, floor 16 — the measured ≥0.8-recall point on
    * unclustered embeddings (round-10 RecallTune sweep at sf0.1: probe
    * c/2 → ivf 0.80 @ 1.17 s vs c/4 → 0.72 @ 1.16 s, EQUAL wall —
    * candidate generation is bucketed either way and the extra
    * candidates ride the same scan; ivfpq at c/2 measured 0.80 @ 2.23 s
    * vs 0.72 @ 3.19 s, strictly better). The fraction, not the count,
    * is what recall tracks, so the default stays O(√n · 1/2) candidates
    * — sublinear at any scale; throughput-tuned callers pass an
    * explicit `nProbe` down to ~numCentroids/64.
    */
  private[sim] def autoProbes(numCentroids: Int): Int =
    math.max(16, numCentroids / 2)

  /** Bucket count sized for ~512 vectors per bucket: planes =
    * log2(n/512), clamped to [2, 20]. Fewer, fuller buckets + 1-bit
    * multi-probe measured 0.84 recall on the driver corpus at EQUAL
    * wall time vs 0.68 at the previous ~256/bucket sizing (round-9
    * RecallTune sweep: planes 2/3/4 → 0.84/0.68/0.46 at 1.6/1.4/1.2 s)
    * — sign-bit buckets are coarse, so recall tracks bucket FULLNESS
    * and the candidate join is bucketed either way.
    */
  private[sim] def autoPlanes(n: Long): Int =
    math.max(2, math.min(20,
      math.ceil(math.log(math.max(n, 1L) / 512.0) / math.log(2.0)).toInt))

  /** Deterministic ±1 hyperplanes (seeded, engine-independent literals): one
    * array<double> literal per plane.
    */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  /** Sign-bit LSH bucket id: bit p = (dot(vec, plane_p) >= 0). */
  def lshBucket(vec: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      when(dot(vec, planeLit) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Approximate top-k: compare only vectors whose LSH bucket matches one
    * of the query's PROBE buckets. Multi-probe (on by default) expands each
    * query to its own bucket plus the `nPlanes` single-bit-flip neighbors —
    * near-misses across one hyperplane stay candidates, which measured
    * 3-5× recall on random embeddings for a (1+nPlanes)× expansion of the
    * SMALL query side only; the corpus is still hashed once and the join
    * stays an equi-join (each corpus vector has one bucket, probe buckets
    * are distinct → no duplicate pairs). Recall < 1 by construction.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nPlanes: Int = -1, dim: Int = 64,
              multiProbe: Boolean = true): DataFrame = {
    // -1 = auto: size the bucket count to the corpus (see autoPlanes);
    // the count() is a parquet-metadata-cheap one-off, paid only on auto
    val planes = hyperplanes(
      if (nPlanes > 0) nPlanes else autoPlanes(corpus.count()), dim)
    val nP = planes.size
    val q0 = queries.select(col("id").as("query_id"), col("vec").as("qv"),
      lshBucket(col("vec"), planes).as("bucket"), norm(col("vec")).as("qn"))
    val q = if (multiProbe)
        q0.select(col("query_id"), col("qv"), col("qn"),
          explode(array(col("bucket") +:
            (0 until nP).map(i =>
              col("bucket").bitwiseXOR(lit(1L << i))): _*)).as("bucket"))
      else q0
    val c = corpus.select(col("id").as("corpus_id"), col("vec").as("cv"),
      lshBucket(col("vec"), planes).as("bucket"), norm(col("vec")).as("cn"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cos"), col("rank"))
  }

  /** IVF (inverted-file) ANN: a deterministic coarse quantizer — a FIXED
    * number of centroids (`numCentroids`), picked as every
    * `ceil(corpusCount / numCentroids)`-th corpus vector by id — assigns
    * each corpus vector to its nearest centroid (one broadcast join, corpus
    * scanned once); a query searches only the vectors in its `nProbe`
    * nearest centroid cells.
    *
    * The centroid count is capped independent of corpus size, so the
    * broadcast stays O(numCentroids·dim) and assignment work is
    * O(n·numCentroids) at any scale — a stride-per-fixed-count quantizer,
    * not a fixed stride (which would grow the centroid set, and the
    * broadcast, linearly with the corpus). The stride is derived
    * declaratively from a broadcast 1-row COUNT — no driver-side collect.
    * A trained k-means quantizer drops in by replacing `centroids`; the
    * deterministic pick keeps the whole pipeline engine-reproducible.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              numCentroids: Int = -1, nProbe: Int = -1): DataFrame = {
    // -1 = auto: sqrt(n) cells, ~1/8 probed (see autoCentroids/autoProbes)
    val c = if (numCentroids > 0) numCentroids
      else autoCentroids(corpus.count(), cap = 65536)
    val p = if (nProbe > 0) nProbe else autoProbes(c)
    val centroids = strideCentroids(corpus, c)
      .withColumn("cn", norm(col("cvec")))
    probeTopK(queries, corpus, centroids, k, p)
  }

  /** IVF top-K at SEVERAL probe budgets from ONE shared cell assignment
    * (r12 optimization round): the probe-curve instrument previously
    * called [[ivfTopK]] once per tier, re-running the corpus cell
    * assignment and the query assignment per tier. Cells of a vector are
    * a PREFIX-stable nearest ordering (score desc, centroid id asc — the
    * NearestCells contract), so one max-probe query assignment carries
    * every tier: tier p keeps probe ranks < p and proceeds exactly as
    * [[ivfTopK]] would. The corpus assignment (identical at every tier)
    * is lineage-cut once, the production "share the one assignment"
    * sweep. Output = ivfTopK(queries, corpus, k, numCentroids, p) with a
    * literal `nprobe` column, per requested p — bit-identical rows.
    */
  def ivfTopKAtProbes(queries: DataFrame, corpus: DataFrame, k: Int,
                      numCentroids: Int, probes: Seq[Int]): DataFrame = {
    val maxP = probes.max
    val centroids = strideCentroids(corpus, numCentroids)
      .withColumn("cn", norm(col("cvec")))
    val local = localCentroids(centroids)
    val corpusCells = (local match {
      case Some(l) => cellAssignLocal(
        corpus.select(col("id").as("corpus_id"), col("vec").as("cv")),
        l, "cv", 1)
      case None => cellAssignJoin(
        corpus.select(col("id").as("corpus_id"), col("vec").as("cv")),
        centroids, "corpus_id", "cv", 1)
    }).localCheckpoint()
    // query side: ONE max-probe assignment, probe rank kept so each tier
    // is a filter instead of a re-assignment
    val qSide = queries.select(col("id").as("query_id"), col("vec").as("qv"))
    val queryCells = (local match {
      case Some(l) =>
        qSide.select(col("query_id"), col("qv"),
          posexplode(graft.functions.NearestCells(col("qv"), l, maxP))
            .as(Seq("__pr", "centroid_id")))
      case None =>
        val scored = qSide.crossJoin(broadcast(centroids))
          .withColumn("__cs", dot(col("qv"), col("cvec"))
            / (norm(col("qv")) * col("cn")))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("__cs").desc, col("centroid_id"))
        scored.withColumn("__pr", row_number().over(w) - 1)
          .filter(col("__pr") < maxP)
          .drop("cvec", "cn", "__cs")
    }).localCheckpoint()
    probes.map { p =>
      val qc = queryCells.filter(col("__pr") < p)
        .select(col("query_id"), col("qv"), col("centroid_id"))
      val scored = corpusCells.join(broadcast(qc), Seq("centroid_id"))
        .filter(col("query_id") =!= col("corpus_id"))
        .withColumn("cos", dot(col("qv"), col("cv"))
          / (norm(col("qv")) * norm(col("cv"))))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("corpus_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(lit(p).as("nprobe"), col("query_id"), col("corpus_id"),
          col("cos"), col("rank"))
    }.reduce(_ unionAll _)
  }

  /** Stride-seeded coarse quantizer: every ceil(n/numCentroids)-th corpus
    * vector by id — at most `numCentroids` of them at any corpus size.
    */
  private[sim] def strideCentroids(corpus: DataFrame, numCentroids: Int): DataFrame = {
    val n = corpus.agg(count(lit(1)).as("__n"))
    corpus.crossJoin(broadcast(n))
      .filter(pmod(col("id"),
        greatest(ceil(col("__n") / numCentroids).cast("long"), lit(1L))) === 0)
      .select(col("id").as("centroid_id"), col("vec").as("cvec"))
  }

  /** Sequential left fold — the exact accumulation order of
    * [[graft.functions.DotProductExpr]], so driver-computed norms carry
    * the same bits Spark-side expressions would.
    */
  private def dotSeq(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** Driver-literal threshold for quantizer state: at or below this many
    * centroids the quantizer rides in the PLAN as one nested Literal node
    * (bounded metadata, O(cells·dim) doubles — the same class as the PQ
    * codebooks and bucket-id collects). Above it, the broadcast-join path
    * keeps plan size flat. The literal path turns cell assignment into a
    * pure scan-side projection — it REMOVES the corpus-sized window
    * shuffle the join path needs for its per-vector argmax, which at
    * 100 TB is a full extra exchange of the corpus.
    */
  private val LiteralCentroidCap = 1024

  /** Collect (centroid_id, cvec, cn) to driver state if the quantizer is
    * under [[LiteralCentroidCap]]; None → caller uses the join path.
    * (`limit(cap+1)` bounds the collect; when the table exceeds the cap
    * the truncated rows are discarded, so nondeterministic limit order
    * can never leak into results.)
    */
  private[sim] def localCentroids(centroids: DataFrame)
      : Option[Array[(Long, Seq[Double], Double)]] = {
    val rows = centroids
      .select(col("centroid_id"), col("cvec").cast("array<double>"),
        col("cn").cast("double"))
      .limit(LiteralCentroidCap + 1).collect()
    if (rows.length > LiteralCentroidCap) None
    else Some(rows.map(r => (r.getLong(0), r.getSeq[Double](1),
      r.getDouble(2))).sortBy(_._1))
  }

  /** `side` plus a `centroid_id` column (exploded to `probes` rows per
    * vector): nearest-cell assignment against a collected quantizer — one
    * pure scan-side projection through the native
    * [[graft.functions.NearestCells]] kernel; no join, no window, and
    * primitive-loop scoring on both eval paths (the interpreted HOF
    * formulation paid ~µs of lambda/boxing overhead per (row, centroid) —
    * it dominated the 256-cell gates).
    */
  private[sim] def cellAssignLocal(side: DataFrame,
      local: Array[(Long, Seq[Double], Double)],
      vecAs: String, probes: Int): DataFrame = {
    val cells = graft.functions.NearestCells(col(vecAs), local, probes)
    if (probes == 1)
      side.withColumn("centroid_id", element_at(cells, 1))
    else
      side.withColumn("centroid_id", explode(cells))
  }

  /** Join-path twin for quantizers over the literal cap: broadcast join +
    * per-vector window ranking (this is the shape that pays a corpus-wide
    * exchange for the argmax — only used when the quantizer is too big to
    * ride in the plan).
    */
  private[sim] def cellAssignJoin(side: DataFrame, centroids: DataFrame,
      idAs: String, vecAs: String, probes: Int): DataFrame = {
    val scored = side.crossJoin(broadcast(centroids))
      .withColumn("__cs", dot(col(vecAs), col("cvec"))
        / (norm(col(vecAs)) * col("cn")))
    val w = Window.partitionBy(col(idAs))
      .orderBy(col("__cs").desc, col("centroid_id"))
    scored.withColumn("__cr", row_number().over(w))
      .filter(col("__cr") <= probes)
      .drop("cvec", "cn", "__cs", "__cr")
  }

  /** The IVF probe: assign corpus vectors to their nearest centroid cell,
    * expand each query to its `nProbe` nearest cells, brute-force only
    * within matching cells. `centroids`: (centroid_id, cvec, cn). The
    * quantizer is collected ONCE and shared by both sides' assignments.
    */
  private def probeTopK(queries: DataFrame, corpus: DataFrame,
      centroids: DataFrame, k: Int, nProbe: Int): DataFrame = {
    val local = localCentroids(centroids)
    def cells(side: DataFrame, idAs: String, vecAs: String, probes: Int) =
      local match {
        case Some(l) => cellAssignLocal(side, l, vecAs, probes)
        case None => cellAssignJoin(side, centroids, idAs, vecAs, probes)
      }
    val corpusCells = cells(
      corpus.select(col("id").as("corpus_id"), col("vec").as("cv")),
      "corpus_id", "cv", 1)
    val queryCells = cells(
      queries.select(col("id").as("query_id"), col("vec").as("qv")),
      "query_id", "qv", nProbe)

    val scored = corpusCells.join(broadcast(queryCells), Seq("centroid_id"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cos", dot(col("qv"), col("cv"))
        / (norm(col("qv")) * norm(col("cv"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cos"), col("rank"))
  }

  /** Quantization grid for centroid updates: flooring every contribution to
    * an exact multiple of 2^-20 makes the per-(centroid, dim) sum EXACT in
    * double while `|sum| < 2^33` — so Spark's parallel aggregation and a
    * sequential engine cannot disagree on the trained centroids. (Exceeding
    * that bound needs > ~8e9 members per cell; coarsen the grid if a corpus
    * ever gets there.)
    */
  private val CentroidGrid = 1048576L

  /** IVF with a spherical-k-means-TRAINED coarse quantizer: stride-seeded
    * centroids refined by `iters` Lloyd rounds (assign to max-cosine cell,
    * re-center on the members' componentwise mean), then the same
    * cell-probe search as [[ivfTopK]]. Trained cells track the data
    * distribution, so recall at equal probe cost beats the stride quantizer
    * on clustered corpora.
    *
    * Scale shape per round: one broadcast-centroids assignment pass over
    * the corpus (O(n·numCentroids) dot products, the standard IVF training
    * cost), one posexplode + hash-agg for the means (map-side combined;
    * only (numCentroids × dim) groups), and the centroid table — never the
    * corpus — is checkpointed between rounds. Deterministic end-to-end:
    * stride seeding, min-id tie-breaks, and exact grid-quantized sums (see
    * [[CentroidGrid]]); empty cells keep their previous centroid.
    */
  def kmeansIvfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      numCentroids: Int = -1, iters: Int = 2, nProbe: Int = -1): DataFrame = {
    // -1 = auto, like ivfTopK; the centroid cap is tighter (4096) because
    // training cost is O(n · numCentroids · iters)
    val c = if (numCentroids > 0) numCentroids
      else autoCentroids(corpus.count(), cap = 4096)
    val p = if (nProbe > 0) nProbe else autoProbes(c)
    val cent = trainCentroids(corpus, c, iters)
    probeTopK(queries, corpus,
      cent.withColumn("cn", norm(col("cvec"))), k, p)
  }

  /** Spherical-k-means training shared by [[kmeansIvfTopK]] and [[pqTopK]]:
    * stride seeding + `iters` grid-quantized Lloyd rounds (see
    * [[CentroidGrid]] for why the sums are engine-exact). Input (id, vec);
    * output (centroid_id, cvec). Per round: one broadcast-centroid
    * assignment pass + a (numCentroids × dim)-group mean agg; only the
    * centroid table is checkpointed.
    */
  private[sim] def trainCentroids(corpus: DataFrame, numCentroids: Int,
      iters: Int): DataFrame = {
    if (numCentroids <= LiteralCentroidCap)
      return trainCentroidsLocal(corpus, numCentroids, iters)
    val c = corpus.select(col("id").as("corpus_id"), col("vec").as("cv"),
      norm(col("vec")).as("nrm"))

    var cent = strideCentroids(corpus, numCentroids)
      .withColumn("cvec", col("cvec").cast("array<double>"))

    for (_ <- 1 to iters) {
      val scored = c.crossJoin(broadcast(cent))
        .withColumn("__cs", dot(col("cv"), col("cvec"))
          / (col("nrm") * norm(col("cvec"))))
      val w = Window.partitionBy(col("corpus_id"))
        .orderBy(col("__cs").desc, col("centroid_id"))
      val assigned = scored.withColumn("__r", row_number().over(w))
        .filter(col("__r") === 1)
        .select(col("centroid_id"), col("cv"))
      val means = assigned
        .select(col("centroid_id"), posexplode(col("cv")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(sum(floor(col("col").cast("double") * CentroidGrid)
            / CentroidGrid).as("s"),
          count(lit(1)).as("cnt"))
        .groupBy(col("centroid_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"),
            (col("s") / col("cnt")).as("m")))),
          x => x.getField("m")).as("mvec"))
      cent = graft.graph.GraphOps.checkpoint(
        cent.join(means, Seq("centroid_id"), "left")
          .select(col("centroid_id"),
            coalesce(col("mvec"), col("cvec")).as("cvec")))
    }
    cent
  }

  /** The under-cap twin of the Lloyd loop above: the centroid table lives
    * on the DRIVER between rounds (O(cells·dim) doubles — bounded
    * metadata), each round is ONE scan-side argmax projection + the
    * (cells × dim)-group mean agg collected back. No broadcast join, no
    * corpus-sized window shuffle, no checkpoint — and bit-identical to the
    * join path: same stride seeds, same cosine folds (driver norms replay
    * DotProductExpr's accumulation order), same grid-quantized mean sums,
    * same (score desc NaN-greatest, centroid_id asc) argmax order, empty
    * cells keep their codeword.
    */
  private def trainCentroidsLocal(corpus: DataFrame, numCentroids: Int,
      iters: Int): DataFrame = {
    val spark = corpus.sparkSession
    val n = corpus.agg(count(lit(1))).collect()(0).getLong(0)
    val stride = math.max(1L, math.ceil(n.toDouble / numCentroids).toLong)
    var cent: Array[(Long, Array[Double])] =
      corpus.filter(pmod(col("id"), lit(stride)) === 0)
        .select(col("id"), col("vec").cast("array<double>")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)

    for (_ <- 1 to iters) {
      val local = cent.map { case (id, v) =>
        (id, v.toSeq, Math.sqrt(dotSeq(v, v))) }
      val assigned = corpus.select(
        element_at(graft.functions.NearestCells(col("vec"), local, 1), 1)
          .as("centroid_id"),
        col("vec").as("cv"))
      val stats = assigned
        .select(col("centroid_id"), posexplode(col("cv")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(sum(floor(col("col").cast("double") * CentroidGrid)
            / CentroidGrid).as("s"),
          count(lit(1)).as("cnt"))
        .collect()
      val byId = cent.zipWithIndex.map { case ((id, _), i) => id -> i }.toMap
      val next = cent.map { case (id, v) => (id, v.clone) }
      stats.foreach { r =>
        next(byId(r.getLong(0)))._2(r.getInt(1)) =
          r.getDouble(2) / r.getLong(3).toDouble
      }
      cent = next
    }
    spark.createDataFrame(cent.toSeq.map { case (id, v) => (id, v.toSeq) })
      .toDF("centroid_id", "cvec")
  }

  /** Product-quantization ANN (asymmetric distance). The memory lever of
    * large-scale vector search: `dim` floats per corpus vector become `m`
    * small codes — the corpus raw vectors are read ONCE at encode time and
    * never touched again at query time.
    *
    *   - Train: the vector is split into `m` equal subspaces; each gets a
    *     `codebookSize`-centroid codebook via the same deterministic
    *     grid-quantized Lloyd rounds as [[kmeansIvfTopK]] (subvector ids
    *     reuse the corpus ids, so seeding is deterministic per subspace).
    *   - Encode: one broadcast-codebook argmax pass per subspace → codes
    *     (id, sub, code), plus each vector's reconstructed norm
    *     `sqrt(Σ_sub |codeword|²)`.
    *   - Query (ADC): each query precomputes dot(q_sub, codeword) for every
    *     (sub, code) — a (queries × m × codebookSize) table, broadcast —
    *     and a corpus vector's approximate cosine is just the SUM of m
    *     table lookups over its codes, normalized by |q|·|x̂|. The scoring
    *     join touches only the integer code table: broadcast equi-join on
    *     (sub, code) + one hash-agg by (query, corpus) — no vector math on
    *     the corpus at query time, no shuffle of anything corpus-sized but
    *     the m-int codes.
    *
    *   - Rerank (on by default, `rerank` > k): the ADC top-`rerank`
    *     shortlist per query is re-scored with EXACT cosines against the
    *     original vectors (one more corpus scan with the broadcast
    *     candidate-id set; no shuffle) — the standard PQ recall recovery.
    *
    * Approximate by construction (quantization error bounds which
    * candidates make the shortlist); recall floors are asserted in
    * SimilaritySpec and reported per round by the bench.
    *
    * Cross-engine exactness: the two places a multi-term DOUBLE sum feeds
    * the output — the per-code ADC lookup values (summed over `m` codes
    * per candidate) and the per-code squared norms (summed into the
    * reconstructed vector norm) — are floor-quantized to the 2^-20 grid
    * BEFORE the sum (same trick as [[CentroidGrid]] training sums), so
    * the sums are exact integers-on-a-grid, independent of addition
    * order, and bit-identical to a sequential SQL oracle's. Relative
    * error ~1e-6 on an approximate score: immaterial for recall.
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      m: Int = 8, codebookSize: Int = 32, iters: Int = 2,
      dim: Int = 64, rerank: Int = 64): DataFrame = {
    val (codes, table) =
      pqIndex(queries, corpus, m, codebookSize, iters, dim)
    // score: sum of m lookups per (query, corpus vector) — every corpus
    // vector is a candidate (flat PQ; see ivfPqTopK for the cell-restricted
    // composition). `xn` rides along as a grouping key (it is functionally
    // determined by corpus_id), saving the separate norm join.
    val scored = codes.join(broadcast(table), Seq("sub", "code"))
      .groupBy(col("query_id"), col("qn"), col("corpus_id"), col("xn"))
      .agg(sum(col("pd")).as("sd"), count(lit(1)).as("nparts"))
    pqRank(scored, queries, corpus, k, m, rerank)
  }

  /** IVF-PQ — the production ANN composition (FAISS's IVFPQ shape): the
    * stride coarse quantizer restricts each query to the corpus vectors in
    * its `nProbe` nearest cells, and PQ/ADC scores ONLY those candidates —
    * so per-query scoring work is O(candidates · m) integer-keyed lookups
    * instead of O(corpus · m), on top of PQ's memory compression. The
    * exact-rerank tail then rescores the ADC shortlist.
    *
    * Scale shape: both restriction joins broadcast SMALL sides (the
    * centroid set, the query cell list, the candidate pair set); the
    * corpus-sized code table is touched once, filtered by the broadcast
    * candidate ids. Deterministic end-to-end like its two parents —
    * the sm8 gate mirrors the whole composition in DuckDB.
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      m: Int = 8, codebookSize: Int = 32, iters: Int = 2, dim: Int = 64,
      numCentroids: Int = -1, nProbe: Int = -1,
      // 128, not pqTopK's 64: the cell restriction already discards most
      // of the corpus, so the extra exact re-scores are nearly free and
      // absorb the ADC ordering noise (r8 sweep: 0.68 → 0.72 recall at
      // EQUAL time; the shortlist is O(rerank) rows per query either way)
      rerank: Int = 128): DataFrame = {
    // -1 = auto, same dial as ivfTopK: sqrt(n) cells, ~1/4 probed
    val c = if (numCentroids > 0) numCentroids
      else autoCentroids(corpus.count(), cap = 65536)
    val p = if (nProbe > 0) nProbe else autoProbes(c)
    val centroids = strideCentroids(corpus, c)
      .withColumn("cn", norm(col("cvec")))
    val local = localCentroids(centroids)
    def cells(side: DataFrame, idAs: String, vecAs: String, probes: Int) =
      (local match {
        case Some(l) => cellAssignLocal(side, l, vecAs, probes)
        case None => cellAssignJoin(side, centroids, idAs, vecAs, probes)
      }).select(col(idAs), col("centroid_id"))
    val corpusCells = cells(
      corpus.select(col("id").as("corpus_id"), col("vec").as("cv")),
      "corpus_id", "cv", 1)
    val queryCells = cells(
      queries.select(col("id").as("query_id"), col("vec").as("qv")),
      "query_id", "qv", p)
    // candidate pairs: corpus vector sits in one of the query's probed
    // cells; unique per (query, corpus) since a corpus vector has ONE cell
    val cand = corpusCells.join(broadcast(queryCells), Seq("centroid_id"))
      .select(col("query_id"), col("corpus_id"))

    val (codes, table) =
      pqIndex(queries, corpus, m, codebookSize, iters, dim)
    val scored = codes.join(broadcast(cand), Seq("corpus_id"))
      .join(broadcast(table), Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("qn"), col("corpus_id"), col("xn"))
      .agg(sum(col("pd")).as("sd"), count(lit(1)).as("nparts"))
    pqRank(scored, queries, corpus, k, m, rerank)
  }

  /** Shared PQ machinery: train the `m` codebooks, encode the corpus, and
    * precompute the queries' ADC lookup tables.
    * Returns (codes (corpus_id, xn, sub, code),
    *          table (query_id, qn, sub, code, pd)).
    *
    * The codebook state lives on the DRIVER between passes — it is
    * O(m · codebookSize · subDim) doubles (a few KB), independent of corpus
    * size, the same bounded-metadata class as the engine's other driver
    * collects (bucket ids, convergence checksums). With codebooks as plan
    * LITERALS, every pass over data becomes a single scan-side codegen
    * projection: Lloyd assignment, corpus encoding, and the ADC tables need
    * NO join, NO window, NO checkpoint — per training round the only
    * exchange left is the (m × codebookSize × subDim)-group mean agg, and
    * encode is pure map work. (The previous shape broadcast-joined a
    * corpus-sized subvector table per round and argmaxed it through a
    * window sort; all of that is now folded into the scan.)
    *
    * Numeric contract unchanged and bit-identical to the sm7/sm8 DuckDB
    * mirrors: dots are strict sequential folds (driver-side folds replay
    * the same IEEE op order as [[graft.functions.DotProductExpr]]), mean
    * sums grid-quantize addends (see [[CentroidGrid]]) so Spark's parallel
    * agg is exact, and the per-(row, sub) argmax — `array_max` over
    * `struct(score, -code)` — has exactly the window's total-order
    * semantics (score desc with NaN greatest, then code asc).
    */
  private def pqIndex(queries: DataFrame, corpus: DataFrame,
      m: Int, codebookSize: Int, iters: Int,
      dim: Int): (DataFrame, DataFrame) = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val G = CentroidGrid.toDouble

    def subSlice(vec: Column, s: Int): Column =
      slice(vec, s * subDim + 1, subDim)

    // Seeding: every ceil(n/codebookSize)-th corpus vector by id, id-ranked
    // — deterministic and identical to the previous stride+row_number pick.
    val n = corpus.count()
    val stride = math.max(1L, math.ceil(n.toDouble / codebookSize).toLong)
    val seeds = corpus.filter(pmod(col("id"), lit(stride)) === 0)
      .orderBy(col("id")).limit(codebookSize)
      .select(col("vec").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    // books(sub)(code) = codeword; all m codebooks share the seed vectors.
    var books: Array[Array[Array[Double]]] = Array.tabulate(m)(s =>
      seeds.map(v => v.slice(s * subDim, (s + 1) * subDim)))

    // Every plan below embeds the codebook state as ONE nested-array
    // Literal node (typedlit), NOT per-codeword CreateArray trees — a
    // m×k×subDim expression forest makes Catalyst's optimizer passes the
    // bottleneck (measured: 3× the whole gate's runtime). With single-node
    // literals + higher-order functions the trees stay tiny; the lambda
    // evaluation is interpreted, but it runs DotProductExpr's eval path —
    // the same sequential fold, bit-identical scores.
    def bl(bs: Array[Array[Array[Double]]]): Column =
      typedlit(bs.map(_.map(_.toSeq).toSeq).toSeq)
    def dl(ds: Array[Array[Double]]): Column =
      typedlit(ds.map(_.toSeq).toSeq)

    // The per-(row, sub) argmax through the native NearestCells kernel
    // (codes as the "cell ids", codeword norms as the denominators,
    // divideByRowNorm = false — PQ assignment scores are dot/|cw| only):
    // max score, NaN greatest, ties → min code; exactly the total order
    // the previous window sort used.
    def argmaxCode(vec: Column, s: Int, bs: Array[Array[Array[Double]]],
        denoms: Array[Array[Double]]): Column = {
      val local = bs(s).indices.map(c =>
        (c.toLong, bs(s)(c).toSeq, denoms(s)(c))).toArray
      element_at(graft.functions.NearestCells(subSlice(vec, s), local, 1,
        divideByRowNorm = false), 1).cast("int")
    }

    // Lloyd rounds: one scan + one bounded-group mean agg per round; the
    // (m × codebookSize × subDim) stat rows (~1k) come back to the driver
    // to refresh the literal codebooks. Empty cells keep their codeword.
    for (_ <- 1 to iters) {
      val denoms = books.map(_.map(cw => Math.sqrt(dotSeq(cw, cw))))
      val assigned = corpus.select(
        posexplode(array((0 until m).map(s =>
          struct(argmaxCode(col("vec"), s, books, denoms).as("code"),
            subSlice(col("vec"), s).as("sv"))): _*)))
        .select(col("pos").as("sub"), col("col.code").as("code"),
          col("col.sv").as("sv"))
      val stats = assigned
        .select(col("sub"), col("code"), posexplode(col("sv")))
        .groupBy(col("sub"), col("code"), col("pos"))
        .agg(sum(floor(col("col").cast("double") * CentroidGrid)
            / CentroidGrid).as("s"),
          count(lit(1)).as("cnt"))
        .collect()
      val next = books.map(_.map(_.clone))
      stats.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
          r.getDouble(3) / r.getLong(4).toDouble
      }
      books = next
    }

    // Encode denominators use the GRID-QUANTIZED codeword norm (cwn2), as
    // before; xn = sqrt(Σ_sub cwn2) — addends are exact on the grid, so the
    // static ascending-sub sum equals the old hash-agg sum bit-for-bit.
    val cwn2 = books.map(_.map(cw => Math.floor(dotSeq(cw, cw) * G) / G))
    val encDenoms = cwn2.map(_.map(Math.sqrt))
    val (bc, cwn2c) = (bl(books), dl(cwn2))
    val codeCols = (0 until m).map(s =>
      argmaxCode(col("vec"), s, books, encDenoms).as(s"c$s"))
    val withCodes = corpus.select(
      (col("id").as("corpus_id") +: codeCols): _*)
    val codes = withCodes
      .withColumn("xn", sqrt((0 until m).map(s =>
        element_at(element_at(cwn2c, s + 1), col(s"c$s") + 1))
        .reduce(_ + _)))
      .select(col("corpus_id"), col("xn"),
        posexplode(array((0 until m).map(s => col(s"c$s")): _*)))
      .select(col("corpus_id"), col("xn"),
        col("pos").as("sub"), col("col").as("code"))

    // ADC tables: dot(q_sub, codeword) for every (query, sub, code) — all
    // (sub, code) cells are static, so the table is one scan: per sub, a
    // transform over that sub's codebook, flattened and exploded.
    val adcPerSub = (0 until m).map { s =>
      transform(element_at(bc, s + 1), (cw, c) =>
        struct(lit(s).as("sub"), c.as("code"),
          (floor(dot(subSlice(col("vec"), s), cw)
            * CentroidGrid) / CentroidGrid).as("pd")))
    }
    val table = queries.select(col("id").as("query_id"),
        norm(col("vec")).as("qn"),
        explode(flatten(array(adcPerSub: _*))).as("e"))
      .select(col("query_id"), col("qn"),
        col("e.sub").as("sub"), col("e.code").as("code"),
        col("e.pd").as("pd"))
    (codes, table)
  }

  /** Shared PQ tail: ADC ranking of the scored pairs + optional exact
    * rerank. `scored`: (query_id, qn, corpus_id, xn, sd, nparts).
    */
  private def pqRank(scored: DataFrame,
      queries: DataFrame, corpus: DataFrame,
      k: Int, m: Int, rerank: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_cos").desc, col("corpus_id"))
    val adcRanked = scored
      .filter(col("nparts") === m && col("query_id") =!= col("corpus_id"))
      .withColumn("approx_cos", col("sd") / (col("qn") * col("xn")))
      .withColumn("rank", row_number().over(w))

    if (rerank <= k)
      // rerank off: the ADC estimate IS the score
      adcRanked.filter(col("rank") <= k)
        .select(col("query_id"), col("corpus_id"),
          col("approx_cos").as("cos"), col("rank"))
    else
      // the standard recall recovery for PQ (quantization error reorders
      // the head, but rarely pushes a true neighbor out of a 64-deep
      // shortlist: measured recall@5 0.26 → ≥0.8 on the worst-case driver
      // embeddings)
      exactRerank(adcRanked.filter(col("rank") <= rerank)
        .select(col("query_id"), col("corpus_id")), queries, corpus, k)
  }

  /** Exact re-ranking of an approximate top-`rerank` shortlist. Scale
    * shape: the candidate id set is (queries × rerank) small and BROADCAST
    * against one more corpus scan — the corpus never shuffles, and the
    * exact scoring is O(queries · rerank) dots.
    */
  private def exactRerank(cand: DataFrame, queries: DataFrame,
      corpus: DataFrame, k: Int): DataFrame = {
    val cvecs = corpus.select(col("id").as("corpus_id"),
      col("vec").as("cvv"), norm(col("vec")).as("cvn"))
    val qvecs = queries.select(col("id").as("query_id"),
      col("vec").as("qvv"), norm(col("vec")).as("qvn"))
    val rw = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id"))
    cvecs.join(broadcast(cand), Seq("corpus_id"))
      .join(broadcast(qvecs), Seq("query_id"))
      .withColumn("cos",
        dot(col("qvv"), col("cvv")) / (col("qvn") * col("cvn")))
      .withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cos"), col("rank"))
  }

  /** Scalar-quantization (int8) ANN — the OTHER classic memory lever next
    * to PQ: each float becomes one byte via a per-dimension affine grid
    * learned from the corpus min/max (2·dim doubles of driver stats — the
    * SQ state is bounded metadata, like the PQ codebooks). Candidates are
    * ranked by the cosine of the DEQUANTIZED vectors — reconstructed on
    * the fly from the byte code and the per-dimension grid (an int8 store
    * is what scans at scale; the floats never persist) — and the
    * top-`rerank` shortlist is re-scored with exact cosines. Flat scan
    * like [[bruteForceTopK]] at 4× less scored state; compose with IVF
    * cells (the sm8 pattern) for the candidate-restricted variant.
    *
    * Deterministic cross-engine: quantization is floor of IEEE
    * (x−mn)·255/(mx−mn) (sub/mul/div are correctly rounded, floor exact),
    * clamped to [0,255]; degenerate dimensions (mx = mn) code to 0;
    * dequantization and the cosine folds are the same sequential IEEE op
    * chains on both engines; both rankings tie-break on corpus id.
    */
  def sq8TopK(queries: DataFrame, corpus: DataFrame, k: Int,
      dim: Int = 64, rerank: Int = 64): DataFrame = {
    val stats = corpus.select(posexplode(col("vec")))
      .groupBy(col("pos"))
      .agg(min(col("col").cast("double")).as("mn"),
        max(col("col").cast("double")).as("mx"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    val mnLit = typedlit(stats.map(_._2).toSeq)
    val mxLit = typedlit(stats.map(_._3).toSeq)
    // quantize-then-dequantize in one projection: x̂ = mn + q·(mx−mn)/255
    def dequant(vec: Column): Column =
      transform(vec, (x, i) => {
        val mn = element_at(mnLit, i + 1)
        val mx = element_at(mxLit, i + 1)
        val q = least(lit(255L), greatest(lit(0L),
          floor((x.cast("double") - mn) * 255.0 / (mx - mn))))
        when(mx > mn, mn + q.cast("double") * (mx - mn) / 255.0)
          .otherwise(mn)
      })

    val qq = queries.select(col("id").as("query_id"),
      dequant(col("vec")).as("qh"))
      .withColumn("qhn", norm(col("qh")))
    val cc = corpus.select(col("id").as("corpus_id"),
      dequant(col("vec")).as("ch"))
      .withColumn("chn", norm(col("ch")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_cos").desc, col("corpus_id"))
    val cand = cc.crossJoin(broadcast(qq))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("approx_cos",
        dot(col("qh"), col("ch")) / (col("qhn") * col("chn")))
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= rerank)
      .select(col("query_id"), col("corpus_id"))
    exactRerank(cand, queries, corpus, k)
  }

  /** Random-projection (Johnson–Lindenstrauss) ANN — the dimensionality
    * lever next to PQ's codebooks and SQ's per-dimension grids: each
    * vector is projected through `rpDims` seeded ±1 hyperplanes (the
    * sign-random JL construction of Achlioptas 2001) and candidates are
    * ranked by cosine in the `rpDims`-dim sketch, then the top-`rerank`
    * shortlist is re-scored exactly. At dim 64 → 16 the scored state
    * shrinks 4× like SQ, but as a LINEAR map: sketches of a fixed corpus
    * can be maintained incrementally (project-on-ingest) with no trained
    * state at all — the projection is pure seed, independent of the data.
    *
    * Deterministic cross-engine: the planes are the same ±1 literals the
    * LSH family renders into both engines, each projected coordinate is
    * one sequential-fold dot, and both rankings tie-break on corpus id.
    * Scale shape: projection is scan-side; the shortlist pass broadcasts
    * only the projected queries; the corpus never shuffles.
    *
    * `rerank = -1` (the default) auto-sizes the exact-rerank shortlist to
    * `max(64, n/6)` capped at 2048: a FIXED 64-row shortlist shrinks to a
    * vanishing fraction of a growing corpus and recall collapses on
    * unclustered (worst-case) embeddings. Round-9 RecallTune sweep on the
    * 2k driver corpus (recall@5 / sec): rpDims 16 → 0.66/0.78/0.84 at
    * rerank n/8/n/6/n/4; rpDims 24 → 0.78/0.84/0.88 at the SAME wall
    * time (projection is scan-side; 8 more coordinates are 8 more fused
    * dots) — hence the 24-dim / n/6 defaults, the measured ≥0.8 point.
    * Cost stays O(rerank) exact dots per query.
    */
  def rpTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      rpDims: Int = 24, dim: Int = 64, rerank: Int = -1,
      seed: Long = 7L): DataFrame = {
    val rr =
      if (rerank > 0) rerank
      else math.min(2048L, math.max(64L, corpus.count() / 6L)).toInt
    val planes = hyperplanes(rpDims, dim, seed)
    def project(vec: Column): Column =
      array(planes.map(p => dot(vec, array(p.map(lit): _*))): _*)
    val qq = queries.select(col("id").as("query_id"),
      project(col("vec")).as("qh"))
      .withColumn("qhn", norm(col("qh")))
    val cc = corpus.select(col("id").as("corpus_id"),
      project(col("vec")).as("ch"))
      .withColumn("chn", norm(col("ch")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_cos").desc, col("corpus_id"))
    val cand = cc.crossJoin(broadcast(qq))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("approx_cos",
        dot(col("qh"), col("ch")) / (col("qhn") * col("chn")))
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= rr)
      .select(col("query_id"), col("corpus_id"))
    exactRerank(cand, queries, corpus, k)
  }

  /** BINARY-quantization ANN — the extreme memory lever of the modern
    * vector stores (1 bit per dimension: 64 floats → 8 bytes, a 32×
    * compression): each dimension codes to the sign of (x − per-dim
    * corpus mean), candidates rank by HAMMING distance between the
    * 64-bit signatures (two xor + bit_count ops per pair — integer-only,
    * the cheapest possible scan), and the top-`rerank` shortlist is
    * re-scored with exact cosines.
    *
    * The per-dimension mean is the only trained state: `dim` doubles of
    * driver metadata (the SQ8 discipline), computed from grid-floored
    * addends so the parallel sum is exact and the one mean division is a
    * single IEEE op — identical in both engines. Signatures are split
    * into two 32-bit halves so no term touches the BIGINT sign bit.
    *
    * Deterministic cross-engine: signature bits compare exact doubles,
    * Hamming is integer, and both rankings tie-break on corpus id.
    * Scale shape: signatures are scan-side projections; the shortlist
    * pass broadcasts only the query signatures; the corpus never
    * shuffles. `rerank = -1` auto-sizes to max(64, n/8) cap 2048 —
    * rpTopK's measured floor discipline (1-bit codes are coarse; a fixed
    * tiny shortlist starves recall as the corpus grows).
    */
  def bqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      dim: Int = 64, rerank: Int = -1): DataFrame = {
    val grid = 1048576L
    val rr =
      if (rerank > 0) rerank
      else math.min(2048L, math.max(64L, corpus.count() / 8L)).toInt
    val means = corpus.select(posexplode(col("vec")))
      .groupBy(col("pos"))
      .agg((sum(floor(col("col").cast("double") * grid) / grid) /
        count(lit(1))).as("m"))
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
      .sortBy(_._1).map(_._2)
    val meanLit = typedlit(means.toSeq)
    def sigHalf(vec: Column, from: Int): Column =
      (from until from + dim / 2).map { d =>
        when(element_at(vec, d + 1).cast("double") >=
          element_at(meanLit, d + 1), lit(1L << (d - from)))
          .otherwise(lit(0L))
      }.reduce(_ + _)
    def sigs(df: DataFrame, idOut: String): DataFrame =
      df.select(col("id").as(idOut), col("vec"),
        sigHalf(col("vec"), 0).as(s"${idOut}_lo"),
        sigHalf(col("vec"), dim / 2).as(s"${idOut}_hi"))
    val qq = sigs(queries, "query_id").drop("vec")
    val cc = sigs(corpus, "corpus_id").drop("vec")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming"), col("corpus_id"))
    val cand = cc.crossJoin(broadcast(qq))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("hamming",
        expr("bit_count(query_id_lo ^ corpus_id_lo) + " +
          "bit_count(query_id_hi ^ corpus_id_hi)"))
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= rr)
      .select(col("query_id"), col("corpus_id"))
    exactRerank(cand, queries, corpus, k)
  }

  /** All corpus pairs with cosine >= tau, via LSH buckets (near-duplicate
    * detection on embeddings). Same-bucket equi-join, never n².
    */
  def cosineNearDupPairs(corpus: DataFrame, tau: Double,
                         nPlanes: Int = 4, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val c = corpus.select(col("id"), col("vec"),
      lshBucket(col("vec"), planes).as("bucket"), norm(col("vec")).as("nrm"))
    // Shuffle self-join: never broadcast the corpus against itself, and the
    // identical shuffle children let ReuseExchange hash/bucket it once.
    c.as("a").hint("shuffle_hash").join(c.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (dot(col("a.vec"), col("b.vec")) / (col("a.nrm") * col("b.nrm")))
          .as("cos"))
      .filter(col("cos") >= tau)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic deduplication
    * by clustering the embedding space with k-means and comparing pairs only
    * WITHIN a cluster — the trick that makes embedding-level dedup tractable
    * at corpus scale. Pairwise cost is Σ|cluster|², not n²: with cluster
    * count grown alongside the corpus (see [[autoCentroids]]), per-cluster
    * populations stay bounded and the whole pass is one bucketed self-join,
    * exactly the shape of the MinHash band join in `Dedup`.
    *
    * Keeper rule: deterministic min-id — a vector is dropped when some
    * SMALLER-id vector in the same cluster has cosine ≥ `tau` with it.
    * (The paper keeps the member farthest from the cluster centroid; any
    * single-representative rule has the same dedup power, and min-id makes
    * the result engine-reproducible.) Like the paper — and unlike
    * connected-component dedup (`dd5`) — the rule is applied per PAIR, not
    * per transitive group: x can be dropped because of y even when y was
    * itself dropped. That is the documented SemDeDup behavior (each
    * ε-neighborhood keeps one point), not an accident.
    *
    * Returns one row per corpus vector: (vec_id, cluster_id,
    * n_dup_smaller, keep 1/0), totally ordered by vec_id.
    *
    * Scale shape: centroid training is [[trainCentroids]] (broadcast
    * centroids, O(k·dim) state); assignment is one broadcast argmax pass;
    * the only corpus-sized shuffle is the cluster-keyed self-join, which
    * `shuffle_hash` + identical children let ReuseExchange hash once.
    */
  def semDedup(corpus: DataFrame, tau: Double, numCentroids: Int = -1,
               iters: Int = 2): DataFrame = {
    val k = if (numCentroids > 0) numCentroids
      else autoCentroids(corpus.count(), cap = 4096)
    val cent = trainCentroids(corpus, k, iters)
      .withColumn("cn", norm(col("cvec")))
    // Scan-side assignment under the literal cap (no broadcast nested-loop
    // join, no per-vector window shuffle); join path beyond it.
    val side = corpus.select(col("id"), col("vec"), norm(col("vec")).as("nrm"))
    val assigned = (localCentroids(cent) match {
      case Some(l) => cellAssignLocal(side, l, "vec", 1)
      case None => cellAssignJoin(side, cent, "id", "vec", 1)
    }).select(col("id"), col("centroid_id"), col("vec"), col("nrm"))
    val dup = assigned.as("a").hint("shuffle_hash").join(assigned.as("b"),
        col("a.centroid_id") === col("b.centroid_id") &&
          col("a.id") < col("b.id"))
      .filter(dot(col("a.vec"), col("b.vec")) / (col("a.nrm") * col("b.nrm"))
        >= tau)
      .groupBy(col("b.id").as("id"))
      .agg(count(lit(1)).as("n_dup"))
    assigned.join(dup, Seq("id"), "left")
      .select(col("id").as("vec_id"), col("centroid_id").as("cluster_id"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup_smaller"),
        when(col("n_dup").isNull, 1).otherwise(0).cast("int").as("keep"))
      .orderBy(col("vec_id"))
  }
}
