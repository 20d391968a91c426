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

  /** Probe ~1/8 of the cells, floor 8 — the measured ≥0.5-recall point on
    * unclustered embeddings (8/45 cells at n=2k → 0.56).
    */
  private[sim] def autoProbes(numCentroids: Int): Int =
    math.max(8, numCentroids / 8)

  /** Bucket count sized for ~256 vectors per bucket: planes =
    * log2(n/256), clamped to [3, 20]. Fewer, fuller buckets + 1-bit
    * multi-probe measured 0.68 recall on the driver corpus (vs 0.46 at a
    * fixed 4 planes).
    */
  private[sim] def autoPlanes(n: Long): Int =
    math.max(3, math.min(20,
      math.ceil(math.log(math.max(n, 1L) / 256.0) / math.log(2.0)).toInt))

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

  /** The IVF probe: assign corpus vectors to their nearest centroid cell,
    * expand each query to its `nProbe` nearest cells, brute-force only
    * within matching cells. `centroids`: (centroid_id, cvec, cn).
    */
  private def probeTopK(queries: DataFrame, corpus: DataFrame,
      centroids: DataFrame, k: Int, nProbe: Int): DataFrame = {
    // nearest centroid per vector (rank 1..nProbe for queries)
    def cells(side: DataFrame, idAs: String, vecAs: String, probes: Int) = {
      val scored = side.crossJoin(broadcast(centroids))
        .withColumn("__cs", dot(col(vecAs), col("cvec"))
          / (norm(col(vecAs)) * col("cn")))
      val w = Window.partitionBy(col(idAs))
        .orderBy(col("__cs").desc, col("centroid_id"))
      scored.withColumn("__cr", row_number().over(w))
        .filter(col("__cr") <= probes)
        .drop("cvec", "cn", "__cs", "__cr")
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
      cent = cent.join(means, Seq("centroid_id"), "left")
        .select(col("centroid_id"),
          coalesce(col("mvec"), col("cvec")).as("cvec"))
        .localCheckpoint(true)
    }
    cent
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
    val (codes, cnorm, table) =
      pqIndex(queries, corpus, m, codebookSize, iters, dim)
    // score: sum of m lookups per (query, corpus vector) — every corpus
    // vector is a candidate (flat PQ; see ivfPqTopK for the cell-restricted
    // composition)
    val scored = codes.join(broadcast(table), Seq("sub", "code"))
      .groupBy(col("query_id"), col("qn"), col("corpus_id"))
      .agg(sum(col("pd")).as("sd"), count(lit(1)).as("nparts"))
    pqRank(scored, cnorm, queries, corpus, k, m, rerank)
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
      rerank: Int = 64): DataFrame = {
    // -1 = auto, same dial as ivfTopK: sqrt(n) cells, ~1/8 probed
    val c = if (numCentroids > 0) numCentroids
      else autoCentroids(corpus.count(), cap = 65536)
    val p = if (nProbe > 0) nProbe else autoProbes(c)
    val centroids = strideCentroids(corpus, c)
      .withColumn("cn", norm(col("cvec")))
    def cells(side: DataFrame, idAs: String, vecAs: String, probes: Int) = {
      val scored = side.crossJoin(broadcast(centroids))
        .withColumn("__cs", dot(col(vecAs), col("cvec"))
          / (norm(col(vecAs)) * col("cn")))
      val w = Window.partitionBy(col(idAs))
        .orderBy(col("__cs").desc, col("centroid_id"))
      scored.withColumn("__cr", row_number().over(w))
        .filter(col("__cr") <= probes)
        .select(col(idAs), col("centroid_id"))
    }
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

    val (codes, cnorm, table) =
      pqIndex(queries, corpus, m, codebookSize, iters, dim)
    val scored = codes.join(broadcast(cand), Seq("corpus_id"))
      .join(broadcast(table), Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("qn"), col("corpus_id"))
      .agg(sum(col("pd")).as("sd"), count(lit(1)).as("nparts"))
    pqRank(scored, cnorm, queries, corpus, k, m, rerank)
  }

  /** Shared PQ machinery: train the `m` codebooks, encode the corpus, and
    * precompute the queries' ADC lookup tables.
    * Returns (codes (corpus_id, sub, code, cwn2),
    *          cnorm (corpus_id, xn),
    *          table (query_id, qn, sub, code, pd)).
    */
  private def pqIndex(queries: DataFrame, corpus: DataFrame,
      m: Int, codebookSize: Int, iters: Int,
      dim: Int): (DataFrame, DataFrame, DataFrame) = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m

    def explodeSubs(df: DataFrame, idName: String): DataFrame =
      df.select(col("id").as(idName),
        posexplode(array((0 until m).map(s =>
          slice(col("vec"), s * subDim + 1, subDim)): _*)))
        .withColumnRenamed("pos", "sub").withColumnRenamed("col", "sv")

    val csubs = explodeSubs(corpus, "corpus_id")

    // All m codebooks train in ONE vectorized Lloyd loop: rows are
    // (vector, subspace) subvectors, codebook membership is keyed by
    // `sub`, so each round is a single broadcast join + argmax window +
    // (m × codebookSize × subDim)-group mean agg — not m sequential
    // trainings. Seeding: the same stride-picked vector ids for every
    // subspace (deterministic, id-ranked).
    val nRow = corpus.agg(count(lit(1)).as("__n"))
    val seedIds = corpus.crossJoin(broadcast(nRow))
      .filter(pmod(col("id"),
        greatest(ceil(col("__n") / codebookSize).cast("long"), lit(1L))) === 0)
      .select(col("id"))
      // BOUNDED global window (emits a "No Partition Defined" warning —
      // provably benign): the stride filter above keeps ≈codebookSize
      // seed ids (≤ a few dozen rows), so the single-partition
      // row_number ranks a handful of rows, never the corpus.
      .withColumn("code",
        row_number().over(Window.orderBy(col("id"))) - 1)
      .filter(col("code") < codebookSize)
    var books = csubs.join(broadcast(seedIds),
        col("corpus_id") === col("id"))
      .select(col("sub"), col("code"),
        col("sv").cast("array<double>").as("cw"))
      .localCheckpoint(true)

    val wAssign = Window.partitionBy(col("corpus_id"), col("sub"))
      .orderBy(col("__s").desc, col("code"))
    for (_ <- 1 to iters) {
      val assigned = csubs.join(broadcast(books), Seq("sub"))
        .withColumn("__s", dot(col("sv"), col("cw"))
          / sqrt(dot(col("cw"), col("cw"))))
        .withColumn("__r", row_number().over(wAssign))
        .filter(col("__r") === 1)
        .select(col("sub"), col("code"), col("sv"))
      val means = assigned
        .select(col("sub"), col("code"), posexplode(col("sv")))
        .groupBy(col("sub"), col("code"), col("pos"))
        .agg(sum(floor(col("col").cast("double") * CentroidGrid)
            / CentroidGrid).as("s"),
          count(lit(1)).as("cnt"))
        .groupBy(col("sub"), col("code"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"),
            (col("s") / col("cnt")).as("mv")))),
          x => x.getField("mv")).as("mvec"))
      books = books.join(means, Seq("sub", "code"), "left")
        .select(col("sub"), col("code"),
          coalesce(col("mvec"), col("cw")).as("cw"))
        .localCheckpoint(true)
    }
    val codebooks = books.withColumn("cwn2",
      floor(dot(col("cw"), col("cw")) * CentroidGrid) / CentroidGrid)

    // encode: for each (vector, subspace), the max-dot codeword
    val codes = csubs.join(broadcast(codebooks), Seq("sub"))
      .withColumn("__s", dot(col("sv"), col("cw"))
        / sqrt(col("cwn2")))
      .withColumn("__r", row_number().over(wAssign))
      .filter(col("__r") === 1)
      .select(col("corpus_id"), col("sub"), col("code"), col("cwn2"))
    val cnorm = codes.groupBy(col("corpus_id"))
      .agg(sqrt(sum(col("cwn2"))).as("xn"))

    // ADC tables: dot(q_sub, codeword) for every (query, sub, code)
    val qsubs = explodeSubs(queries, "query_id")
    val qnorms = queries.select(col("id").as("query_id"),
      norm(col("vec")).as("qn"))
    val table = qsubs.join(qnorms, Seq("query_id"))
      .join(broadcast(codebooks), Seq("sub"))
      .select(col("query_id"), col("qn"), col("sub"), col("code"),
        (floor(dot(col("sv"), col("cw")) * CentroidGrid) / CentroidGrid)
          .as("pd"))
    (codes, cnorm, table)
  }

  /** Shared PQ tail: ADC ranking of the scored pairs + optional exact
    * rerank. `scored`: (query_id, qn, corpus_id, sd, nparts).
    */
  private def pqRank(scored: DataFrame, cnorm: DataFrame,
      queries: DataFrame, corpus: DataFrame,
      k: Int, m: Int, rerank: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_cos").desc, col("corpus_id"))
    val adcRanked = scored
      .filter(col("nparts") === m && col("query_id") =!= col("corpus_id"))
      .join(cnorm, Seq("corpus_id"))
      .withColumn("approx_cos", col("sd") / (col("qn") * col("xn")))
      .withColumn("rank", row_number().over(w))

    if (rerank <= k)
      // rerank off: the ADC estimate IS the score
      adcRanked.filter(col("rank") <= k)
        .select(col("query_id"), col("corpus_id"),
          col("approx_cos").as("cos"), col("rank"))
    else {
      // Exact re-ranking of the ADC top-`rerank` shortlist — the standard
      // recall recovery for PQ (quantization error reorders the head, but
      // rarely pushes a true neighbor out of a 64-deep shortlist: measured
      // recall@5 0.26 → ≥0.8 on the worst-case driver embeddings). Scale
      // shape: the candidate id set is (queries × rerank) small and
      // BROADCAST against one more corpus scan — the corpus still never
      // shuffles, and the exact scoring is O(queries · rerank) dots.
      val cand = adcRanked.filter(col("rank") <= rerank)
        .select(col("query_id"), col("corpus_id"))
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
    val scored = corpus
      .select(col("id"), col("vec"), norm(col("vec")).as("nrm"))
      .crossJoin(broadcast(cent))
      .withColumn("__cs", dot(col("vec"), col("cvec")) / (col("nrm") * col("cn")))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("__cs").desc, col("centroid_id"))
    val assigned = scored.withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .select(col("id"), col("centroid_id"), col("vec"), col("nrm"))
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
