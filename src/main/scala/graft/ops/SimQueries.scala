package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sim.{Pca, Similarity}

/** Similarity-search queries over `embeddings` (64-dim `array<float>`):
  * brute-force cosine top-k (exactness baseline), LSH-bucketed approximate
  * top-k (the scale path), and embedding near-dup pairs. The ±1 hyperplanes
  * are seeded literals rendered identically into the Spark plan and the
  * DuckDB oracle, so even the approximate results match exactly.
  */
object SimQueries {

  private val K = 5
  private val NQueries = 10
  private[ops] val NPlanes = 4
  private[ops] val Dim = 64
  private[ops] val NearDupTau = 0.3
  private val NumCentroids = 256
  private val NProbe = 2
  private val KMeansCentroids = 8
  private val KMeansIters = 2
  private val Grid = 1048576L
  private val PqM = 16
  private val PqCodebook = 16
  private val PqIters = 2
  private val PqSubDim = Dim / PqM
  private val PqRerank = 64
  private val IvfPqCentroids = 64
  private val IvfPqProbe = 8
  private val IvfStoreCentroids = 64
  private val IvfStoreProbe = 8
  private val SemDedupTau = 0.3
  private val RpDims = 16
  private val RpSeed = 7L
  private val PcaIters = 3
  private val MmrShortlist = 20
  private val MmrK = 8
  private val RangeTau = 0.2
  private val RrfShortlist = 20
  private val RrfK = 10
  private val RrfC = 60

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))

  /** DuckDB sequential-fold dot product over the first `n` elements of two
    * list expressions — same accumulation order as the native `vec_dot`.
    */
  private def dotNSql(a: String, b: String, n: Int): String =
    s"list_reduce(list_transform(generate_series(1, $n), " +
      s"i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (acc, x) -> acc + x)"

  private def dotSql(a: String, b: String): String = dotNSql(a, b, Dim)

  private[ops] def cosSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  /** Plane p as a DuckDB list literal. */
  private lazy val planeLits: Seq[String] =
    Similarity.hyperplanes(NPlanes, Dim)
      .map(_.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ", ", "]"))

  private def cosNSql(a: String, b: String, n: Int): String =
    s"${dotNSql(a, b, n)} / (sqrt(${dotNSql(a, a, n)}) * sqrt(${dotNSql(b, b, n)}))"

  /** The JL sketch of `v` as a DuckDB list: one sequential-fold dot per
    * seeded ±1 plane — the literal mirror of `Similarity.rpTopK`'s
    * projection.
    */
  private lazy val rpProjSql: String =
    Similarity.hyperplanes(RpDims, Dim, RpSeed)
      .map(_.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ", ", "]"))
      .map(p => dotNSql("embedding", p, Dim))
      .mkString("[", ", ", "]")

  /** DuckDB LSH bucket: bit p = sign of dot(vec, plane_p). */
  private[ops] def bucketSql(v: String): String =
    planeLits.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN ${dotSql(v, p)} >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "sm1_topk_bruteforce" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.bruteForceTopK(e.filter(col("id") < NQueries), e, K)
        .orderBy(col("query_id"), col("rank"))
    }),

    "sm2_topk_lsh" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.lshTopK(e.filter(col("id") < NQueries), e, K, NPlanes, Dim)
        .orderBy(col("query_id"), col("rank"))
    }),

    // HYBRID RETRIEVAL via Reciprocal-Rank Fusion (Cormack et al., SIGIR
    // 2009): the production RAG/search shape — a LEXICAL ranked list
    // (word-set Jaccard of the query document vs the corpus, exact ppm
    // integers) fused with a SEMANTIC ranked list (sm1's brute cosine)
    // by score Σ 1e6 div (60 + rank). RRF needs only the RANKS, so the
    // fusion is exact integer arithmetic even though one list is
    // float-scored; a doc missing from a list contributes 0. Scale
    // shape: the lexical side is a token equi-join (qt is NQueries docs
    // — broadcast), the vector side is the sm1 scan, the fusion joins
    // two (NQueries × shortlist)-row lists — bounded. doc_id and vec_id
    // share the id space (TESTDATA: parallel tables).
    "sm22_hybrid_rrf" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val toks = Tables(s, dir, "documents")
        .select(col("doc_id"), explode(array_distinct(
          split(lower(trim(col("text"))), "\\s+"))).as("t"))
        .filter(col("t") =!= "")
      val sz = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val qt = toks.filter(col("doc_id") < NQueries)
        .select(col("doc_id").as("query_id"), col("t"))
      val inter = broadcast(qt)
        .join(toks.select(col("doc_id").as("corpus_id"), col("t")), "t")
        .filter(col("corpus_id") =!= col("query_id"))
        .groupBy(col("query_id"), col("corpus_id"))
        .agg(count(lit(1)).as("ov"))
      val lex = inter
        .join(sz.select(col("doc_id").as("query_id"), col("sz").as("qsz")),
          "query_id")
        .join(sz.select(col("doc_id").as("corpus_id"), col("sz").as("csz")),
          "corpus_id")
        .withColumn("j_ppm", expr("ov * 1000000 div (qsz + csz - ov)"))
        .withColumn("lex_rank", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("j_ppm").desc, col("corpus_id"))).cast("long"))
        .filter(col("lex_rank") <= RrfShortlist)
        .select(col("query_id"), col("corpus_id"), col("lex_rank"))
      val e = emb(s, dir)
      val vec = Similarity
        .bruteForceTopK(e.filter(col("id") < NQueries), e, RrfShortlist)
        .select(col("query_id"), col("corpus_id"),
          col("rank").cast("long").as("vec_rank"))
      lex.join(vec, Seq("query_id", "corpus_id"), "full_outer")
        .withColumn("rrf_ppm",
          coalesce(expr(s"1000000 div ($RrfC + lex_rank)"), lit(0L)) +
            coalesce(expr(s"1000000 div ($RrfC + vec_rank)"), lit(0L)))
        .withColumn("fused_rank", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("rrf_ppm").desc, col("corpus_id"))).cast("long"))
        .filter(col("fused_rank") <= RrfK)
        .select(col("query_id"), col("corpus_id"), col("lex_rank"),
          col("vec_rank"), col("rrf_ppm"), col("fused_rank"))
        .orderBy(col("query_id"), col("fused_rank"))
    }),

    "sm3_cosine_neardups" -> ((s, dir) =>
      Similarity.cosineNearDupPairs(emb(s, dir), NearDupTau, NPlanes, Dim)
        .orderBy(col("id_a"), col("id_b"))),

    // Radius search (fixed-threshold retrieval): the answer-set size is
    // data-dependent, which top-k can't express. Scan-shaped plan — the
    // query set broadcasts, the corpus never shuffles, no window at all.
    "sm19_range_search" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.rangeSearch(e.filter(col("id") < NQueries), e, RangeTau)
        .orderBy(col("query_id"), col("corpus_id"))
    }),

    "sm4_topk_ivf" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.ivfTopK(e.filter(col("id") < NQueries), e, K,
          NumCentroids, NProbe)
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF RECALL-vs-PROBE curve — the "measure, don't guess" instrument
    // behind every nprobe default: exact hit counts of the IVF top-K
    // against the brute-force truth at nprobe ∈ {1,2,4,8}, as integers
    // (hits and a ppm recall division — nothing approximate about the
    // evaluation itself). sm20's tier structure applied to the probe
    // budget instead of the embedding dim. r12 optimization round: the
    // four tiers now SHARE one cell assignment (prefix-stable nearest
    // ordering — Similarity.ivfTopKAtProbes) and the brute-force truth is
    // lineage-cut once instead of re-deriving per tier — the production
    // sweep shape the earlier note said a real run would use. Per-tier
    // rows are bit-identical to per-tier ivfTopK calls.
    "sm23_ivf_probe_curve" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("id") < NQueries)
      val truth = Similarity.bruteForceTopK(q, e, K)
        .select(col("query_id"), col("corpus_id")).localCheckpoint()
      val hits = Similarity
        .ivfTopKAtProbes(q, e, K, NumCentroids, Seq(1, 2, 4, 8))
        .select(col("nprobe"), col("query_id"), col("corpus_id"))
        .join(truth, Seq("query_id", "corpus_id"), "left_semi")
        .groupBy(col("nprobe")).agg(count(lit(1)).as("__h"))
      // every tier emits a row even at zero hits (the ungrouped count of
      // the old per-tier shape) — left join against the literal tier set
      q.sparkSession.range(0, 4)
        .select(expr("shiftleft(1, CAST(id AS INT))").as("nprobe"))
        .join(hits, Seq("nprobe"), "left")
        .select(col("nprobe"), coalesce(col("__h"), lit(0L)).as("n_hits"))
        .withColumn("recall_ppm",
          expr(s"n_hits * 1000000 div ${NQueries * K}"))
        .orderBy(col("nprobe"))
    }),

    // IVF with a TRAINED quantizer: spherical k-means (2 Lloyd rounds from
    // the stride seed) — cells follow the data distribution instead of the
    // id sequence. Deterministic cross-engine: grid-quantized exact mean
    // sums, min-id tie-breaks (see Similarity.kmeansIvfTopK).
    "sm5_topk_kmeans" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.kmeansIvfTopK(e.filter(col("id") < NQueries), e, K,
          KMeansCentroids, KMeansIters, NProbe)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Product-quantization ANN (the memory lever: 64 floats → 16 codes,
    // asymmetric-distance scoring touches only the integer code table at
    // query time), plus exact re-ranking of the ADC top-64 shortlist.
    // Fully ORACLED: the 16 codebooks' Lloyd training, encoding argmax,
    // ADC scoring, and rerank are mirrored as chained DuckDB CTEs
    // (grid-quantized sums make every multi-term double sum exact and
    // order-independent in both engines — see Similarity.pqTopK).
    "sm7_topk_pq" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.pqTopK(e.filter(col("id") < NQueries), e, K,
          m = 16, codebookSize = 16, iters = 2, dim = Dim, rerank = PqRerank)
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF-PQ composition (the FAISS IVFPQ shape): the stride coarse
    // quantizer restricts each query to its 8 nearest cells' vectors, PQ
    // ADC scores only those candidates, exact rerank of the shortlist.
    // Fully oracled — the entire composition is mirrored as DuckDB CTEs.
    "sm8_topk_ivfpq" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.ivfPqTopK(e.filter(col("id") < NQueries), e, K,
          m = 16, codebookSize = 16, iters = 2, dim = Dim,
          numCentroids = IvfPqCentroids, nProbe = IvfPqProbe,
          rerank = PqRerank)
        .orderBy(col("query_id"), col("rank"))
    }),

    // MATRYOSHKA truncation eval: recall@5 of brute-force search over
    // only the FIRST d dimensions vs the full 64 — the instrument behind
    // the truncate-your-embeddings storage/latency trade (MRL-style
    // models front-load information; this measures how much a given
    // corpus actually loses). One corpus×queries broadcast scan per
    // tier; cosines are the same sequential-fold kernels over sliced
    // arrays, so the DuckDB mirror (first-n folds) lands on identical
    // bits. d=64 rides along as the recall=1.0 sanity row.
    "sm20_matryoshka" -> ((s, dir) => {
      val e = emb(s, dir)
      val full = Similarity
        .bruteForceTopK(e.filter(col("id") < NQueries), e, K)
        .select(col("query_id"), col("corpus_id"))
      def tier(d: Int): DataFrame = {
        val t = e.select(col("id"),
          slice(col("vec"), 1, d).as("vec"))
        Similarity.bruteForceTopK(t.filter(col("id") < NQueries), t, K)
          .select(lit(d).as("dim"), col("query_id"), col("corpus_id"))
      }
      // left-outer + flag, NOT semi+group: a tier with ZERO hits (d=8 at
      // sf0.1) must still report its 0 row — every tier carries its full
      // NQ·K candidate rows into the agg
      Seq(8, 16, 32, 64).map(tier).reduce(_ unionByName _)
        .join(full.withColumn("__hit", lit(1L)),
          Seq("query_id", "corpus_id"), "left_outer")
        .groupBy(col("dim"))
        .agg(sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
        .select(col("dim"), col("n_hits"),
          expr(s"n_hits * 1000000 div (${NQueries * K})").as("recall_ppm"))
        .orderBy(col("dim"))
    }),

    // Per-label cluster cohesion: each label's centroid and the mean cosine
    // of its members to it — the standard embedding-space diagnostic for a
    // labeled corpus (tight labels → high avg_cos). One posexplode, one
    // (label, dim) hash-agg for the centroids (map-side combined; the
    // centroid table is O(labels · dim), broadcastable at any corpus
    // size), one broadcast probe back, one (vec, dim)-local re-agg.
    // Every double addend is floor-quantized to the 2^-20 grid before
    // SUM, so the parallel sums are exact and order-independent —
    // bit-identical to DuckDB's sequential ones (same trick as tx9).
    "sm6_label_cohesion" -> ((s, dir) => {
      val ex = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("dim", "v")))
        .withColumn("vq",
          floor(col("v").cast("double") * Grid) / Grid)
      val cent = ex.groupBy(col("label"), col("dim"))
        .agg(sum(col("vq")).as("sv"), count(lit(1)).as("n"))
        .withColumn("c", col("sv") / col("n"))
        .select(col("label"), col("dim"), col("c"))
      val perVec = ex.join(broadcast(cent), Seq("label", "dim"))
        .groupBy(col("vec_id"), col("label"))
        .agg(
          sum(floor(col("vq") * col("c") * Grid) / Grid).as("dot"),
          sum(floor(col("vq") * col("vq") * Grid) / Grid).as("nv"),
          sum(floor(col("c") * col("c") * Grid) / Grid).as("nc"))
        .withColumn("cosq",
          floor(col("dot") / (sqrt(col("nv")) * sqrt(col("nc"))) * Grid) /
            Grid)
      perVec.groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          (sum(col("cosq")) / count(lit(1))).as("avg_cos"))
        .orderBy(col("label"))
    }),

    // SemDeDup (arXiv:2303.09540): k-means the embedding space, then
    // near-dup pairs are sought only WITHIN a cluster — Σ|cluster|² work
    // instead of n². Same trained quantizer as sm5 (2 grid-exact Lloyd
    // rounds), min-id keeper, per-pair (not transitive) drop — see
    // Similarity.semDedup. Fully oracled: the training CTEs are sm5's,
    // the within-cluster pair count is plain SQL.
    "sm10_semdedup" -> ((s, dir) =>
      Similarity.semDedup(emb(s, dir), SemDedupTau,
        KMeansCentroids, KMeansIters)),

    // The STANDING vector index: even vec_ids bootstrap (training the
    // frozen stride quantizer), odd vec_ids append as a second
    // manifest-committed segment, queries probe cell-partitioned
    // directories only. The frozen quantizer makes the two-batch build
    // equal to a one-shot index over the union — which is exactly what the
    // oracle recomputes relationally (assignment argmax + probe + rank).
    "sm9_ivf_store" -> ((s, dir) => {
      val root = graft.sim.IvfStore.materializedEmbeddingsDir(
        s, dir, IvfStoreCentroids)
      graft.sim.IvfStore.topK(s, root,
          emb(s, dir).filter(col("id") < NQueries), K, IvfStoreProbe)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Scalar-quantization (int8) ANN — each float becomes one byte on a
    // per-dimension affine grid learned from corpus min/max; candidates
    // rank by the EXACT integer dot of the codes, the top-64 shortlist is
    // re-scored with exact cosines (sm7's rerank tail). Fully oracled:
    // quantization is floor of correctly-rounded IEEE arithmetic, so both
    // engines compute identical codes, identical integer scores, and an
    // identical shortlist.
    "sm11_topk_sq8" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.sq8TopK(e.filter(col("id") < NQueries), e, K,
          dim = Dim, rerank = PqRerank)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Hard-negative mining — the training-pair construction step of
    // contrastive/retrieval training: per query vector, the top-k most
    // similar corpus vectors whose LABEL differs (maximum-loss negatives).
    // Same broadcast-query / WindowGroupLimit shape as sm1; the label
    // inequality filters below the score so the corpus is scanned once.
    "sm12_hard_negatives" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"),
          col("label"))
      Similarity.hardNegativeTopK(e.filter(col("id") < NQueries), e, K)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Random-projection (JL) ANN — 64 dims sketched to 16 through seeded
    // ±1 hyperplanes (a pure-seed LINEAR map: no trained state, sketches
    // maintainable on ingest), shortlist by sketch cosine, exact rerank.
    // The planes render as identical literals in both engines, so the
    // sketch ranking — and therefore the whole result — is bit-exact.
    "sm13_topk_rp" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.rpTopK(e.filter(col("id") < NQueries), e, K,
          rpDims = RpDims, dim = Dim, rerank = PqRerank)
        .orderBy(col("query_id"), col("rank"))
    }),

    // BINARY-quantization ANN — 1 bit per dimension (sign of x − per-dim
    // corpus mean): 64 floats → one 64-bit signature, candidates ranked
    // by integer Hamming distance (xor + bit_count), exact rerank of the
    // shortlist. The mean is grid-exact bounded driver state (the SQ8
    // discipline), so signatures — and the whole result — are bit-exact
    // cross-engine.
    "sm21_topk_bq" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.bqTopK(e.filter(col("id") < NQueries), e, K,
          dim = Dim, rerank = PqRerank)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Top principal component by distributed power iteration (3 rounds
    // from the 1/√dim seed), then every embedding's projection onto it —
    // the dominant-variance analysis/whitening primitive. Engine-exact:
    // grid-quantized mean/matvec/norm sums (order-independent dyadic
    // rationals) and correctly-rounded sqrt/divide only, so the oracle
    // unrolls the identical three rounds as chained CTEs (see sim.Pca).
    "sm14_pca_power" -> ((s, dir) => {
      val e = emb(s, dir)
      val (mean, v) = Pca.topComponent(e, "vec", Dim, PcaIters)
      Pca.projections(e, "id", "vec", mean, v)
        .select(col("id").as("vec_id"), col("proj"))
        .orderBy(col("vec_id"))
    }),

    // MMR-DIVERSIFIED top-k: relevance shortlist (exact top-20 cosine),
    // then 8 greedy picks trading relevance against redundancy with the
    // picked set (λ = 0.5 — an exact IEEE combination of fold-identical
    // cosines). The greedy loop runs on the bounded per-query candidate
    // array only; the oracle replays the same 8 steps as unrolled
    // relational CTEs over the shortlist + its bounded pairwise-sim
    // table. See Similarity.mmrTopK for the scale shape.
    "sm15_topk_mmr" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.mmrTopK(e.filter(col("id") < NQueries), e,
          m = MmrShortlist, k = MmrK)
        .orderBy(col("query_id"), col("pick_rank"))
    }),

    // FILTERED vector search (tenant/collection-scoped): exact top-k
    // among corpus vectors sharing the query's LABEL — the
    // metadata-predicate-under-ANN capability production vector stores
    // call filtered search. See Similarity.sameLabelTopK.
    "sm18_filtered_topk" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"),
          col("label"))
      Similarity.sameLabelTopK(e.filter(col("id") < NQueries), e, K)
        .orderBy(col("query_id"), col("rank"))
    }),

    // EMBEDDING-SPACE DRIFT monitor: the corpus split into two cohorts
    // (vec_id parity — the stand-in for before/after an ingestion
    // change), per-cohort MEAN vectors from exact integer grid sums, and
    // the cosine between the means + their norms — the cheap
    // did-the-distribution-move signal a production embedding pipeline
    // alerts on (ev5/q47 watch scalar columns; this watches the vector
    // space itself). Deterministic: integer sums, two correctly-rounded
    // divisions per coordinate, one sequential fold per reduction.
    // Scale: one scan → O(2·dim) cells; everything after is driver-size.
    "sm17_embedding_drift" -> ((s, dir) => {
      val g = 1048576L
      val ex = Tables(s, dir, "embeddings")
        .select((col("vec_id") % 2).as("side"),
          posexplode(col("embedding")).as(Seq("pos", "xf")))
        .select(col("side"), col("pos"),
          floor(col("xf").cast("double") * g).cast("long").as("xq"))
      val cells = ex.groupBy(col("side"), col("pos"))
        .agg(sum(col("xq")).as("s"), count(lit(1)).as("cnt"))
        .withColumn("m", col("s").cast("double") /
          col("cnt").cast("double") / lit(g.toDouble))
      def side(p: Int) = cells.filter(col("side") === p)
        .groupBy(col("side"))
        .agg(max(col("cnt")).as(s"n_$p"),
          transform(array_sort(collect_list(struct(col("pos"), col("m")))),
            x => x.getField("m")).as(s"mv_$p"))
        .drop("side")
      side(0).crossJoin(side(1))
        .select(col("n_0").as("n_a"), col("n_1").as("n_b"),
          (Similarity.dot(col("mv_0"), col("mv_1")) /
            (sqrt(Similarity.dot(col("mv_0"), col("mv_0"))) *
              sqrt(Similarity.dot(col("mv_1"), col("mv_1")))))
            .as("cos_means"),
          sqrt(Similarity.dot(col("mv_0"), col("mv_0"))).as("norm_a"),
          sqrt(Similarity.dot(col("mv_1"), col("mv_1"))).as("norm_b"))
    }),

    // SQ8 QUANTIZATION-DISTORTION report — the measure-don't-guess op for
    // the compressed-index stack (dd12's twin for vectors): per
    // dimension, the reconstruction error of the int8 scalar quantizer
    // sm11 searches with (grid-quantized squared-error sum — exact under
    // any aggregation order — plus the worst-case absolute error, which
    // for a uniform 255-step grid must stay ≤ (mx−mn)/255). One explode
    // + one join to the 64-row stats table + one hash agg; this is how
    // an index owner decides whether 8-bit grids are safe for a new
    // embedding distribution before switching the fleet to them.
    "sm16_sq8_distortion" -> ((s, dir) => {
      val ex = Tables(s, dir, "embeddings")
        .select(col("vec_id"), posexplode(col("embedding"))
          .as(Seq("pos", "xf")))
        .select(col("pos"), col("xf").cast("double").as("x"))
      val stats = ex.groupBy(col("pos"))
        .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      ex.join(broadcast(stats), "pos")
        .withColumn("xhat", when(col("mx") > col("mn"),
          col("mn") + least(lit(255.0), greatest(lit(0.0),
            floor((col("x") - col("mn")) * 255.0 /
              (col("mx") - col("mn"))))) *
            (col("mx") - col("mn")) / 255.0).otherwise(col("mn")))
        .withColumn("err", col("x") - col("xhat"))
        .groupBy((col("pos") + 1).cast("long").as("d"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("err") * col("err") * Grid) / Grid)
            .as("sq_err_sum"),
          max(abs(col("err"))).as("max_abs_err"))
        .orderBy(col("d"))
    })
  )

  /** One unrolled power round: mean·v scalar, per-row projection, un-
    * normalized matvec, grid norm, normalized component — the literal
    * mirror of `Pca.step` (all sums are grid-quantized dyadic rationals,
    * so DuckDB's arbitrary aggregation order lands on Spark's bits).
    */
  private def pcaRoundSql(t: Int, prev: String): String = s"""
      md$t AS (
        SELECT SUM(floor(m.m * v.v * $Grid) / $Grid) AS md
        FROM pmean m JOIN $prev v USING (d)
      ), pp$t AS (
        SELECT e.vec_id,
          SUM(floor(e.x * v.v * $Grid) / $Grid)
            - (SELECT md FROM md$t) AS p
        FROM pex e JOIN $prev v USING (d) GROUP BY e.vec_id
      ), uu$t AS (
        SELECT e.d, SUM(floor((e.x - m.m) * p.p * $Grid) / $Grid) AS u
        FROM pex e JOIN pmean m USING (d) JOIN pp$t p USING (vec_id)
        GROUP BY e.d
      ), ss$t AS (SELECT SUM(floor(u * u * $Grid) / $Grid) AS s FROM uu$t),
      vv$t AS (
        SELECT d, u / sqrt((SELECT s FROM ss$t)) AS v FROM uu$t
      )"""

  val oracleSql: Map[String, String] = Map(
    "sm17_embedding_drift" -> s"""
      WITH ex AS (
        SELECT vec_id % 2 AS side, d AS pos,
          CAST(floor(e.embedding[d]::DOUBLE * $Grid) AS BIGINT) AS xq
        FROM embeddings e, (SELECT unnest(generate_series(1, $Dim)) AS d)
      ), cells AS (
        SELECT side, pos,
          CAST(SUM(xq) AS BIGINT)::DOUBLE
            / CAST(COUNT(*) AS BIGINT)::DOUBLE / $Grid AS m,
          CAST(COUNT(*) AS BIGINT) AS cnt
        FROM ex GROUP BY 1, 2
      ), mv AS (
        SELECT side, MAX(cnt) AS n, list(m ORDER BY pos) AS v
        FROM cells GROUP BY 1
      )
      SELECT a.n AS n_a, b.n AS n_b,
        ${dotNSql("a.v", "b.v", 64)}
          / (sqrt(${dotNSql("a.v", "a.v", 64)})
             * sqrt(${dotNSql("b.v", "b.v", 64)})) AS cos_means,
        sqrt(${dotNSql("a.v", "a.v", 64)}) AS norm_a,
        sqrt(${dotNSql("b.v", "b.v", 64)}) AS norm_b
      FROM mv a, mv b WHERE a.side = 0 AND b.side = 1""",

    "sm16_sq8_distortion" -> s"""
      WITH ex AS (
        SELECT d AS pos, e.embedding[d]::DOUBLE AS x
        FROM embeddings e, (SELECT unnest(generate_series(1, $Dim)) AS d)
      ), stats AS (
        SELECT pos, MIN(x) AS mn, MAX(x) AS mx FROM ex GROUP BY 1
      ), errs AS (
        SELECT ex.pos,
          ex.x - (CASE WHEN s.mx > s.mn THEN
            s.mn + least(255.0, greatest(0.0,
              floor((ex.x - s.mn) * 255.0 / (s.mx - s.mn))))
              * (s.mx - s.mn) / 255.0
            ELSE s.mn END) AS err
        FROM ex JOIN stats s USING (pos)
      )
      SELECT CAST(pos AS BIGINT) AS d, CAST(COUNT(*) AS BIGINT) AS n,
        SUM(floor(err * err * $Grid) / $Grid) AS sq_err_sum,
        MAX(abs(err)) AS max_abs_err
      FROM errs GROUP BY 1 ORDER BY 1""",

    "sm15_topk_mmr" -> {
      // AS MATERIALIZED on every level: DuckDB inlines CTEs by default
      // and this chain references each sel level twice, doubling the
      // expansion per step — 2^8 recomputations of the full-corpus
      // cosine shortlist measured 556 s of the 638 s total oracle wall
      // at sf0.01 (round-10 profile). Materialization is purely
      // physical; results are unchanged.
      def step(t: Int) = s"""rem$t AS MATERIALIZED (
        SELECT r.* FROM shortlist r
        WHERE NOT EXISTS (SELECT 1 FROM sel${t - 1} s
          WHERE s.query_id = r.query_id AND s.corpus_id = r.corpus_id)
      ), pen$t AS MATERIALIZED (
        SELECT p.query_id, p.ca AS corpus_id, MAX(p.sim) AS mx
        FROM pairs p JOIN sel${t - 1} s
          ON s.query_id = p.query_id AND s.corpus_id = p.cb
        GROUP BY 1, 2
      ), pk$t AS MATERIALIZED (
        SELECT query_id, corpus_id, score, $t AS pick FROM (
          SELECT r.query_id, r.corpus_id,
            0.5 * r.cos - 0.5 * pen.mx AS score,
            ROW_NUMBER() OVER (PARTITION BY r.query_id
              ORDER BY 0.5 * r.cos - 0.5 * pen.mx DESC, r.corpus_id) AS rn
          FROM rem$t r JOIN pen$t pen
            ON pen.query_id = r.query_id AND pen.corpus_id = r.corpus_id
        ) WHERE rn = 1
      ), sel$t AS MATERIALIZED (
        SELECT * FROM sel${t - 1} UNION ALL SELECT * FROM pk$t
      )"""
      s"""
      WITH q AS (
        SELECT vec_id AS query_id, embedding AS qv FROM embeddings
        WHERE vec_id < $NQueries
      ), shortlist AS MATERIALIZED (
        SELECT query_id, corpus_id, cos FROM (
          SELECT query_id, corpus_id, cos,
            ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, corpus_id) AS rank
          FROM (
            SELECT query_id, c.vec_id AS corpus_id,
              ${cosSql("qv", "c.embedding")} AS cos
            FROM embeddings c, q WHERE c.vec_id != query_id
          )
        ) WHERE rank <= $MmrShortlist
      ), pairs AS MATERIALIZED (
        SELECT a.query_id, a.corpus_id AS ca, b.corpus_id AS cb,
          ${cosSql("ea.embedding", "eb.embedding")} AS sim
        FROM shortlist a
        JOIN shortlist b ON a.query_id = b.query_id
          AND a.corpus_id != b.corpus_id
        JOIN embeddings ea ON ea.vec_id = a.corpus_id
        JOIN embeddings eb ON eb.vec_id = b.corpus_id
      ), sel1 AS MATERIALIZED (
        SELECT query_id, corpus_id, 0.5 * cos AS score, 1 AS pick
        FROM (
          SELECT query_id, corpus_id, cos,
            ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, corpus_id) AS rn
          FROM shortlist
        ) WHERE rn = 1
      ), ${(2 to MmrK).map(step).mkString(", ")}
      SELECT query_id, corpus_id, score AS mmr_score,
        CAST(pick AS INT) AS pick_rank
      FROM sel$MmrK ORDER BY query_id, pick_rank"""
    },

    "sm14_pca_power" -> s"""
      WITH pdims AS (SELECT unnest(generate_series(1, $Dim)) AS d),
      pex AS (
        SELECT vec_id, d, embedding[d]::DOUBLE AS x FROM embeddings, pdims
      ), pn AS (SELECT COUNT(*)::DOUBLE AS n FROM embeddings),
      pmean AS (
        SELECT d, SUM(floor(x * $Grid) / $Grid) / (SELECT n FROM pn) AS m
        FROM pex GROUP BY d
      ), vv0 AS (SELECT d, 1.0 / sqrt($Dim.0) AS v FROM pdims),
      ${(1 to PcaIters).map(t =>
        pcaRoundSql(t, if (t == 1) "vv0" else s"vv${t - 1}")).mkString(", ")},
      mdf AS (
        SELECT SUM(floor(m.m * v.v * $Grid) / $Grid) AS md
        FROM pmean m JOIN vv$PcaIters v USING (d)
      )
      SELECT e.vec_id,
        SUM(floor(e.x * v.v * $Grid) / $Grid) - (SELECT md FROM mdf) AS proj
      FROM pex e JOIN vv$PcaIters v USING (d)
      GROUP BY e.vec_id ORDER BY e.vec_id""",

    "sm1_topk_bruteforce" -> s"""
      WITH q AS (
        SELECT vec_id AS query_id, embedding AS qv FROM embeddings
        WHERE vec_id < $NQueries
      ), scored AS (
        SELECT query_id, c.vec_id AS corpus_id,
          ${cosSql("qv", "c.embedding")} AS cos
        FROM embeddings c, q WHERE c.vec_id != query_id
      ), ranked AS (
        SELECT query_id, corpus_id, cos,
          ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY cos DESC, corpus_id) AS rank
        FROM scored
      )
      SELECT query_id, corpus_id, cos, rank FROM ranked
      WHERE rank <= $K ORDER BY query_id, rank""",

    "sm20_matryoshka" -> {
      def tier(d: Int) = s"""
      t$d AS (
        SELECT query_id, corpus_id FROM (
          SELECT query_id, c.vec_id AS corpus_id,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY ${cosNSql("qv", "c.embedding", d)} DESC, c.vec_id)
              AS rank
          FROM embeddings c, q WHERE c.vec_id != query_id
        ) WHERE rank <= $K
      )"""
      def row(d: Int) =
        s"""SELECT $d AS dim, CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM t$d x JOIN t64 f ON x.query_id = f.query_id
          AND x.corpus_id = f.corpus_id"""
      s"""
      WITH q AS (
        SELECT vec_id AS query_id, embedding AS qv FROM embeddings
        WHERE vec_id < $NQueries
      ),${Seq(8, 16, 32, 64).map(tier).mkString(",")}
      SELECT dim, n_hits,
        n_hits * 1000000 // ${NQueries * K} AS recall_ppm
      FROM (${Seq(8, 16, 32, 64).map(row).mkString(" UNION ALL ")})
      ORDER BY dim"""
    },

    "sm19_range_search" -> s"""
      WITH q AS (
        SELECT vec_id AS query_id, embedding AS qv FROM embeddings
        WHERE vec_id < $NQueries
      ), scored AS (
        SELECT query_id, c.vec_id AS corpus_id,
          ${cosSql("qv", "c.embedding")} AS cos
        FROM embeddings c, q WHERE c.vec_id != query_id
      )
      SELECT query_id, corpus_id, cos FROM scored
      WHERE cos >= $RangeTau ORDER BY query_id, corpus_id""",

    "sm2_topk_lsh" -> s"""
      WITH b AS (
        SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket
        FROM embeddings
      ), q AS (
        SELECT vec_id AS query_id, embedding AS qv,
          unnest([bucket${(0 until NPlanes)
            .map(i => s", xor(bucket, ${1L << i})").mkString}]) AS bucket
        FROM b WHERE vec_id < $NQueries
      ), scored AS (
        SELECT query_id, c.vec_id AS corpus_id,
          ${cosSql("qv", "c.embedding")} AS cos
        FROM b c JOIN q USING (bucket) WHERE c.vec_id != query_id
      ), ranked AS (
        SELECT query_id, corpus_id, cos,
          ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY cos DESC, corpus_id) AS rank
        FROM scored
      )
      SELECT query_id, corpus_id, cos, rank FROM ranked
      WHERE rank <= $K ORDER BY query_id, rank""",

    "sm22_hybrid_rrf" -> s"""
      WITH toks AS (
        SELECT doc_id, t FROM (
          SELECT doc_id, unnest(list_distinct(
            regexp_split_to_array(trim(lower(text)), '\\s+'))) AS t
          FROM documents)
        WHERE t <> ''
      ), sz AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM toks GROUP BY 1
      ), inter AS (
        SELECT a.doc_id AS query_id, b.doc_id AS corpus_id,
          CAST(COUNT(*) AS BIGINT) AS ov
        FROM toks a JOIN toks b ON a.t = b.t
        WHERE a.doc_id < $NQueries AND b.doc_id <> a.doc_id
        GROUP BY 1, 2
      ), lex AS (
        SELECT query_id, corpus_id, lex_rank FROM (
          SELECT i.query_id, i.corpus_id,
            CAST(row_number() OVER (PARTITION BY i.query_id
              ORDER BY i.ov * 1000000 // (qs.sz + cs.sz - i.ov) DESC,
                i.corpus_id) AS BIGINT) AS lex_rank
          FROM inter i
          JOIN sz qs ON qs.doc_id = i.query_id
          JOIN sz cs ON cs.doc_id = i.corpus_id)
        WHERE lex_rank <= $RrfShortlist
      ), vq AS (
        SELECT vec_id AS query_id, embedding AS qv FROM embeddings
        WHERE vec_id < $NQueries
      ), vec AS (
        SELECT query_id, corpus_id, CAST(rank AS BIGINT) AS vec_rank
        FROM (
          SELECT query_id, c.vec_id AS corpus_id,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY ${cosSql("qv", "c.embedding")} DESC, c.vec_id)
              AS rank
          FROM embeddings c, vq WHERE c.vec_id != query_id)
        WHERE rank <= $RrfShortlist
      ), fused AS (
        SELECT COALESCE(l.query_id, v.query_id) AS query_id,
          COALESCE(l.corpus_id, v.corpus_id) AS corpus_id,
          l.lex_rank, v.vec_rank,
          CAST(COALESCE(1000000 // ($RrfC + l.lex_rank), 0)
            + COALESCE(1000000 // ($RrfC + v.vec_rank), 0) AS BIGINT)
            AS rrf_ppm
        FROM lex l FULL OUTER JOIN vec v
          ON l.query_id = v.query_id AND l.corpus_id = v.corpus_id
      )
      SELECT query_id, corpus_id, lex_rank, vec_rank, rrf_ppm, fused_rank
      FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY rrf_ppm DESC, corpus_id) AS BIGINT) AS fused_rank
        FROM fused)
      WHERE fused_rank <= $RrfK
      ORDER BY query_id, fused_rank""",

    "sm3_cosine_neardups" -> s"""
      WITH b AS (
        SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket
        FROM embeddings
      )
      SELECT * FROM (
        SELECT a.vec_id AS id_a, e.vec_id AS id_b,
          ${cosSql("a.embedding", "e.embedding")} AS cos
        FROM b a JOIN b e ON a.bucket = e.bucket AND a.vec_id < e.vec_id
      ) WHERE cos >= $NearDupTau ORDER BY id_a, id_b""",

    "sm4_topk_ivf" -> s"""
      WITH cent AS (
        SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings
        WHERE vec_id % greatest(CAST(ceil(
          (SELECT COUNT(*) FROM embeddings) / $NumCentroids.0) AS BIGINT), 1) = 0
      ), corpus_scored AS (
        SELECT c.vec_id AS corpus_id, ct.centroid_id, c.embedding AS cv,
          ${cosSql("c.embedding", "ct.cvec")} AS cs
        FROM embeddings c, cent ct
      ), corpus_cells AS (
        SELECT corpus_id, centroid_id, cv FROM (
          SELECT corpus_id, centroid_id, cv,
            ROW_NUMBER() OVER (PARTITION BY corpus_id
                               ORDER BY cs DESC, centroid_id) AS cr
          FROM corpus_scored
        ) WHERE cr = 1
      ), query_scored AS (
        SELECT q.vec_id AS query_id, ct.centroid_id, q.embedding AS qv,
          ${cosSql("q.embedding", "ct.cvec")} AS cs
        FROM embeddings q, cent ct WHERE q.vec_id < $NQueries
      ), query_cells AS (
        SELECT query_id, centroid_id, qv FROM (
          SELECT query_id, centroid_id, qv,
            ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cs DESC, centroid_id) AS cr
          FROM query_scored
        ) WHERE cr <= $NProbe
      ), scored AS (
        SELECT query_id, corpus_id, ${cosSql("qv", "cv")} AS cos
        FROM corpus_cells JOIN query_cells USING (centroid_id)
        WHERE query_id != corpus_id
      ), ranked AS (
        SELECT query_id, corpus_id, cos,
          ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY cos DESC, corpus_id) AS rank
        FROM scored
      )
      SELECT query_id, corpus_id, cos, rank FROM ranked
      WHERE rank <= $K ORDER BY query_id, rank""",

    "sm23_ivf_probe_curve" -> {
      def tier(p: Int) = s"""
      t$p AS (
        SELECT query_id, corpus_id FROM (
          SELECT query_id, corpus_id,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos DESC, corpus_id) AS rank
          FROM (
            SELECT query_id, corpus_id, ${cosSql("qv", "cv")} AS cos
            FROM corpus_cells JOIN query_cells USING (centroid_id)
            WHERE query_id != corpus_id AND cr <= $p)
        ) WHERE rank <= $K
      )"""
      def row(p: Int) =
        s"""SELECT $p AS nprobe, CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM t$p x JOIN truth f ON x.query_id = f.query_id
          AND x.corpus_id = f.corpus_id"""
      s"""
      WITH cent AS (
        SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings
        WHERE vec_id % greatest(CAST(ceil(
          (SELECT COUNT(*) FROM embeddings) / $NumCentroids.0) AS BIGINT),
          1) = 0
      ), corpus_scored AS (
        SELECT c.vec_id AS corpus_id, ct.centroid_id, c.embedding AS cv,
          ${cosSql("c.embedding", "ct.cvec")} AS cs
        FROM embeddings c, cent ct
      ), corpus_cells AS (
        SELECT corpus_id, centroid_id, cv FROM (
          SELECT corpus_id, centroid_id, cv,
            ROW_NUMBER() OVER (PARTITION BY corpus_id
                               ORDER BY cs DESC, centroid_id) AS cr
          FROM corpus_scored
        ) WHERE cr = 1
      ), query_scored AS (
        SELECT q.vec_id AS query_id, ct.centroid_id, q.embedding AS qv,
          ${cosSql("q.embedding", "ct.cvec")} AS cs
        FROM embeddings q, cent ct WHERE q.vec_id < $NQueries
      ), query_cells AS (
        SELECT query_id, centroid_id, qv, cr FROM (
          SELECT query_id, centroid_id, qv,
            ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cs DESC, centroid_id) AS cr
          FROM query_scored
        ) WHERE cr <= 8
      ), truth AS (
        SELECT query_id, corpus_id FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
            ROW_NUMBER() OVER (PARTITION BY q.vec_id
              ORDER BY ${cosSql("q.embedding", "c.embedding")} DESC,
                c.vec_id) AS rank
          FROM embeddings c, embeddings q
          WHERE q.vec_id < $NQueries AND c.vec_id != q.vec_id
        ) WHERE rank <= $K
      ),${Seq(1, 2, 4, 8).map(tier).mkString(",")}
      SELECT nprobe, n_hits,
        n_hits * 1000000 // ${NQueries * K} AS recall_ppm
      FROM (${Seq(1, 2, 4, 8).map(row).mkString(" UNION ALL ")})
      ORDER BY nprobe"""
    },

    "sm5_topk_kmeans" -> s"""
      WITH cent_seed AS (
        SELECT vec_id AS centroid_id,
          list_transform(embedding, x -> x::DOUBLE) AS cvec
        FROM embeddings
        WHERE vec_id % greatest(CAST(ceil(
          (SELECT COUNT(*) FROM embeddings) / $KMeansCentroids.0) AS BIGINT), 1) = 0
      ), ${(1 to KMeansIters).map(i =>
        lloydRoundSql(i, if (i == 1) "cent_seed" else s"cent${i - 1}"))
        .mkString(", ")}, corpus_scored AS (
        SELECT c.vec_id AS corpus_id, ct.centroid_id, c.embedding AS cv,
          ${cosSql("c.embedding", "ct.cvec")} AS cs
        FROM embeddings c, cent$KMeansIters ct
      ), corpus_cells AS (
        SELECT corpus_id, centroid_id, cv FROM (
          SELECT corpus_id, centroid_id, cv,
            ROW_NUMBER() OVER (PARTITION BY corpus_id
                               ORDER BY cs DESC, centroid_id) AS cr
          FROM corpus_scored
        ) WHERE cr = 1
      ), query_scored AS (
        SELECT q.vec_id AS query_id, ct.centroid_id, q.embedding AS qv,
          ${cosSql("q.embedding", "ct.cvec")} AS cs
        FROM embeddings q, cent$KMeansIters ct WHERE q.vec_id < $NQueries
      ), query_cells AS (
        SELECT query_id, centroid_id, qv FROM (
          SELECT query_id, centroid_id, qv,
            ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cs DESC, centroid_id) AS cr
          FROM query_scored
        ) WHERE cr <= $NProbe
      ), scored AS (
        SELECT query_id, corpus_id, ${cosSql("qv", "cv")} AS cos
        FROM corpus_cells JOIN query_cells USING (centroid_id)
        WHERE query_id != corpus_id
      ), ranked AS (
        SELECT query_id, corpus_id, cos,
          ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY cos DESC, corpus_id) AS rank
        FROM scored
      )
      SELECT query_id, corpus_id, cos, rank FROM ranked
      WHERE rank <= $K ORDER BY query_id, rank""",

    // sm5's trained quantizer verbatim (seed + 2 Lloyd CTEs + argmax
    // assignment), then the SemDeDup tail: within-cluster smaller-id
    // near-dup count and the keep flag.
    "sm10_semdedup" -> s"""
      WITH cent_seed AS (
        SELECT vec_id AS centroid_id,
          list_transform(embedding, x -> x::DOUBLE) AS cvec
        FROM embeddings
        WHERE vec_id % greatest(CAST(ceil(
          (SELECT COUNT(*) FROM embeddings) / $KMeansCentroids.0) AS BIGINT), 1) = 0
      ), ${(1 to KMeansIters).map(i =>
        lloydRoundSql(i, if (i == 1) "cent_seed" else s"cent${i - 1}"))
        .mkString(", ")}, corpus_scored AS (
        SELECT c.vec_id AS corpus_id, ct.centroid_id, c.embedding AS cv,
          ${cosSql("c.embedding", "ct.cvec")} AS cs
        FROM embeddings c, cent$KMeansIters ct
      ), corpus_cells AS (
        SELECT corpus_id, centroid_id, cv FROM (
          SELECT corpus_id, centroid_id, cv,
            ROW_NUMBER() OVER (PARTITION BY corpus_id
                               ORDER BY cs DESC, centroid_id) AS cr
          FROM corpus_scored
        ) WHERE cr = 1
      ), dup AS (
        SELECT b.corpus_id AS id, COUNT(*) AS n_dup
        FROM corpus_cells a JOIN corpus_cells b
          ON a.centroid_id = b.centroid_id AND a.corpus_id < b.corpus_id
        WHERE ${cosSql("a.cv", "b.cv")} >= $SemDedupTau
        GROUP BY 1
      )
      SELECT c.corpus_id AS vec_id, c.centroid_id AS cluster_id,
        COALESCE(d.n_dup, 0) AS n_dup_smaller,
        CAST(CASE WHEN d.id IS NULL THEN 1 ELSE 0 END AS INT) AS keep
      FROM corpus_cells c LEFT JOIN dup d ON c.corpus_id = d.id
      ORDER BY vec_id""",

    "sm7_topk_pq" -> pqSql,

    "sm8_topk_ivfpq" -> ivfPqSql,

    "sm6_label_cohesion" -> s"""
      WITH ex AS (
        SELECT vec_id, label,
          unnest(generate_series(1, len(embedding))) AS dim,
          embedding AS e
        FROM embeddings
      ), exq AS (
        SELECT vec_id, label, dim,
          floor(e[dim]::DOUBLE * $Grid) / $Grid AS vq
        FROM ex
      ), cent AS (
        SELECT label, dim, SUM(vq) / COUNT(*) AS c
        FROM exq GROUP BY label, dim
      ), pv AS (
        SELECT vec_id, exq.label,
          SUM(floor(vq * c * $Grid) / $Grid) AS dot,
          SUM(floor(vq * vq * $Grid) / $Grid) AS nv,
          SUM(floor(c * c * $Grid) / $Grid) AS nc
        FROM exq JOIN cent USING (label, dim)
        GROUP BY vec_id, exq.label
      ), pc AS (
        SELECT vec_id, label,
          floor(dot / (sqrt(nv) * sqrt(nc)) * $Grid) / $Grid AS cosq
        FROM pv
      )
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
        SUM(cosq) / COUNT(*) AS avg_cos
      FROM pc GROUP BY label ORDER BY label""",

    // One-shot relational recompute of the incrementally-built index: the
    // quantizer strides over the EVEN-id bootstrap batch only; assignment,
    // probing, and ranking are sm4's shapes over the full corpus.
    "sm9_ivf_store" -> s"""
      WITH boot AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0
      ), cent AS (
        SELECT vec_id AS centroid_id, embedding AS cvec FROM boot
        WHERE vec_id % greatest(CAST(ceil(
          (SELECT COUNT(*) FROM boot) / $IvfStoreCentroids.0) AS BIGINT),
          1) = 0
      ), corpus_scored AS (
        SELECT c.vec_id AS corpus_id, ct.centroid_id, c.embedding AS cv,
          ${cosSql("c.embedding", "ct.cvec")} AS cs
        FROM embeddings c, cent ct
      ), corpus_cells AS (
        SELECT corpus_id, centroid_id, cv FROM (
          SELECT corpus_id, centroid_id, cv,
            ROW_NUMBER() OVER (PARTITION BY corpus_id
                               ORDER BY cs DESC, centroid_id) AS cr
          FROM corpus_scored
        ) WHERE cr = 1
      ), query_scored AS (
        SELECT q.vec_id AS query_id, ct.centroid_id, q.embedding AS qv,
          ${cosSql("q.embedding", "ct.cvec")} AS cs
        FROM embeddings q, cent ct WHERE q.vec_id < $NQueries
      ), query_cells AS (
        SELECT query_id, centroid_id, qv FROM (
          SELECT query_id, centroid_id, qv,
            ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cs DESC, centroid_id) AS cr
          FROM query_scored
        ) WHERE cr <= $IvfStoreProbe
      ), scored AS (
        SELECT query_id, corpus_id, ${cosSql("qv", "cv")} AS cos
        FROM corpus_cells JOIN query_cells USING (centroid_id)
        WHERE query_id != corpus_id
      ), ranked AS (
        SELECT query_id, corpus_id, cos,
          ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY cos DESC, corpus_id) AS rank
        FROM scored
      )
      SELECT query_id, corpus_id, cos, rank FROM ranked
      WHERE rank <= $K ORDER BY query_id, rank""",

    // Full mirror of Similarity.sq8TopK: per-dimension min/max grid,
    // floor-quantized int8 codes dequantized back to x̂ = mn + q·(mx−mn)/255,
    // approximate-cosine shortlist over x̂, exact cosine rerank. Every
    // step is the same sequential IEEE op chain on both engines.
    "sm11_topk_sq8" -> s"""
      WITH sq_stats AS (
        SELECT d, MIN(e.embedding[d]::DOUBLE) AS mn,
          MAX(e.embedding[d]::DOUBLE) AS mx
        FROM embeddings e, (SELECT unnest(generate_series(1, $Dim)) AS d)
        GROUP BY 1
      ), sq_codes AS (
        SELECT e.vec_id AS id,
          list(CASE WHEN s.mx > s.mn THEN
              s.mn + least(255.0, greatest(0.0,
                floor((e.embedding[s.d]::DOUBLE - s.mn) * 255.0
                  / (s.mx - s.mn)))) * (s.mx - s.mn) / 255.0
            ELSE s.mn END ORDER BY s.d) AS q
        FROM embeddings e, sq_stats s
        GROUP BY 1
      ), cand AS (
        SELECT query_id, corpus_id FROM (
          SELECT qq.id AS query_id, cc.id AS corpus_id,
            ROW_NUMBER() OVER (PARTITION BY qq.id
                               ORDER BY ${cosSql("qq.q", "cc.q")} DESC,
                                 cc.id) AS r
          FROM sq_codes cc, sq_codes qq
          WHERE qq.id < $NQueries AND cc.id != qq.id
        ) WHERE r <= $PqRerank
      ), exact AS (
        SELECT c.query_id, c.corpus_id,
          ${cosSql("q.embedding", "e.embedding")} AS cos
        FROM cand c
        JOIN embeddings q ON q.vec_id = c.query_id
        JOIN embeddings e ON e.vec_id = c.corpus_id
      ), reranked AS (
        SELECT query_id, corpus_id, cos,
          ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY cos DESC, corpus_id) AS rank
        FROM exact
      )
      SELECT query_id, corpus_id, cos, rank FROM reranked
      WHERE rank <= $K ORDER BY query_id, rank""",

    // Per-dim means from grid-floored addends (exact sum, one IEEE
    // division), sign-bit signatures in two 32-bit halves (no BIGINT
    // sign-bit term), integer Hamming ranking, sm11's exact-rerank tail.
    "sm21_topk_bq" -> s"""
      WITH mean_stats AS (
        SELECT d,
          SUM(floor(e.embedding[d]::DOUBLE * $Grid) / $Grid) / COUNT(*)
            AS m
        FROM embeddings e, (SELECT unnest(generate_series(1, $Dim)) AS d)
        GROUP BY 1
      ), sig AS (
        SELECT e.vec_id AS id,
          CAST(SUM(CASE WHEN s.d <= ${Dim / 2}
              AND e.embedding[s.d]::DOUBLE >= s.m
            THEN CAST(1 AS BIGINT) << (s.d - 1) ELSE 0 END) AS BIGINT)
            AS lo,
          CAST(SUM(CASE WHEN s.d > ${Dim / 2}
              AND e.embedding[s.d]::DOUBLE >= s.m
            THEN CAST(1 AS BIGINT) << (s.d - ${Dim / 2 + 1}) ELSE 0 END)
            AS BIGINT) AS hi
        FROM embeddings e, mean_stats s
        GROUP BY 1
      ), cand AS (
        SELECT query_id, corpus_id FROM (
          SELECT qq.id AS query_id, cc.id AS corpus_id,
            ROW_NUMBER() OVER (PARTITION BY qq.id
              ORDER BY bit_count(xor(qq.lo, cc.lo))
                + bit_count(xor(qq.hi, cc.hi)), cc.id) AS r
          FROM sig cc, sig qq
          WHERE qq.id < $NQueries AND cc.id != qq.id
        ) WHERE r <= $PqRerank
      ), exact AS (
        SELECT c.query_id, c.corpus_id,
          ${cosSql("q.embedding", "e.embedding")} AS cos
        FROM cand c
        JOIN embeddings q ON q.vec_id = c.query_id
        JOIN embeddings e ON e.vec_id = c.corpus_id
      ), reranked AS (
        SELECT query_id, corpus_id, cos,
          ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY cos DESC, corpus_id) AS rank
        FROM exact
      )
      SELECT query_id, corpus_id, cos, rank FROM reranked
      WHERE rank <= $K ORDER BY query_id, rank""",

    "sm18_filtered_topk" -> s"""
      WITH q AS (
        SELECT vec_id AS query_id, label AS query_label, embedding AS qv
        FROM embeddings WHERE vec_id < $NQueries
      ), scored AS (
        SELECT query_id, query_label, c.vec_id AS corpus_id,
          ${cosSql("qv", "c.embedding")} AS cos
        FROM embeddings c, q
        WHERE c.label = q.query_label AND c.vec_id != q.query_id
      ), ranked AS (
        SELECT query_id, query_label, corpus_id, cos,
          ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY cos DESC, corpus_id) AS rank
        FROM scored
      )
      SELECT query_id, query_label, corpus_id, cos,
        CAST(rank AS BIGINT) AS rank
      FROM ranked WHERE rank <= $K ORDER BY query_id, rank""",

    // sm1's shape with the cross-label restriction — same sequential-fold
    // cosine, so approximate ranks are bit-identical.
    "sm12_hard_negatives" -> s"""
      WITH q AS (
        SELECT vec_id AS query_id, label AS query_label, embedding AS qv
        FROM embeddings WHERE vec_id < $NQueries
      ), scored AS (
        SELECT query_id, query_label, c.vec_id AS corpus_id,
          c.label AS neg_label,
          ${cosSql("qv", "c.embedding")} AS cos
        FROM embeddings c, q WHERE c.label != q.query_label
      ), ranked AS (
        SELECT query_id, query_label, corpus_id, neg_label, cos,
          ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY cos DESC, corpus_id) AS rank
        FROM scored
      )
      SELECT query_id, query_label, corpus_id, neg_label, cos, rank
      FROM ranked WHERE rank <= $K ORDER BY query_id, rank""",

    // JL-sketch shortlist (16-dim cosine over the projected lists) +
    // sm11's exact-rerank tail; the ±1 planes are the same literals the
    // Spark plan carries.
    "sm13_topk_rp" -> s"""
      WITH rp AS (
        SELECT vec_id AS id, $rpProjSql AS h FROM embeddings
      ), cand AS (
        SELECT query_id, corpus_id FROM (
          SELECT qq.id AS query_id, cc.id AS corpus_id,
            ROW_NUMBER() OVER (PARTITION BY qq.id
                               ORDER BY ${cosNSql("qq.h", "cc.h", RpDims)} DESC,
                                 cc.id) AS r
          FROM rp cc, rp qq
          WHERE qq.id < $NQueries AND cc.id != qq.id
        ) WHERE r <= $PqRerank
      ), exact AS (
        SELECT c.query_id, c.corpus_id,
          ${cosSql("q.embedding", "e.embedding")} AS cos
        FROM cand c
        JOIN embeddings q ON q.vec_id = c.query_id
        JOIN embeddings e ON e.vec_id = c.corpus_id
      ), reranked AS (
        SELECT query_id, corpus_id, cos,
          ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY cos DESC, corpus_id) AS rank
        FROM exact
      )
      SELECT query_id, corpus_id, cos, rank FROM reranked
      WHERE rank <= $K ORDER BY query_id, rank"""
  )

  /** One Lloyd round as CTEs `a<i>`, `m<i>`, `cent<i>` reading centroid CTE
    * `prev` — mirror of one iteration inside `Similarity.kmeansIvfTopK`
    * (max-cosine assignment with min-id tie-break, grid-quantized exact
    * component sums, empty cells keep the previous centroid).
    */
  private def lloydRoundSql(i: Int, prev: String): String = s"""a$i AS (
        SELECT centroid_id, cv FROM (
          SELECT corpus_id, centroid_id, cv,
            ROW_NUMBER() OVER (PARTITION BY corpus_id
                               ORDER BY cs DESC, centroid_id) AS r
          FROM (
            SELECT c.vec_id AS corpus_id, ct.centroid_id, c.embedding AS cv,
              ${cosSql("c.embedding", "ct.cvec")} AS cs
            FROM embeddings c, $prev ct
          )
        ) WHERE r = 1
      ), m$i AS (
        SELECT centroid_id, d,
          SUM(floor(cv[d]::DOUBLE * $Grid) / $Grid) AS s, COUNT(*) AS cnt
        FROM a$i, (SELECT unnest(generate_series(1, $Dim)) AS d)
        GROUP BY 1, 2
      ), cent$i AS (
        SELECT p.centroid_id, COALESCE(m.mvec, p.cvec) AS cvec
        FROM $prev p LEFT JOIN (
          SELECT centroid_id, list(s / cnt ORDER BY d) AS mvec
          FROM m$i GROUP BY 1
        ) m USING (centroid_id)
      )"""

  /** One PQ Lloyd round over all $PqM codebooks at once as CTEs `pa<i>`,
    * `pm<i>`, `books<i>` reading `prev` — mirror of one iteration inside
    * `Similarity.pqTopK` (per-(vector,subspace) max-cosine assignment with
    * min-code tie-break, grid-quantized exact component sums, empty codes
    * keep the previous codeword).
    */
  private def pqRoundSql(i: Int, prev: String): String = s"""pa$i AS (
        SELECT sub, code, sv FROM (
          SELECT corpus_id, sub, code, sv,
            ROW_NUMBER() OVER (PARTITION BY corpus_id, sub
                               ORDER BY s DESC, code) AS r
          FROM (
            SELECT cs.corpus_id, cs.sub, b.code, cs.sv,
              ${dotNSql("cs.sv", "b.cw", PqSubDim)}
                / sqrt(${dotNSql("b.cw", "b.cw", PqSubDim)}) AS s
            FROM pq_csubs cs JOIN $prev b ON cs.sub = b.sub
          )
        ) WHERE r = 1
      ), pm$i AS (
        SELECT sub, code, d,
          SUM(floor(sv[d]::DOUBLE * $Grid) / $Grid) AS s, COUNT(*) AS cnt
        FROM pa$i, (SELECT unnest(generate_series(1, $PqSubDim)) AS d)
        GROUP BY 1, 2, 3
      ), books$i AS (
        SELECT p.sub, p.code, COALESCE(m.mvec, p.cw) AS cw
        FROM $prev p LEFT JOIN (
          SELECT sub, code, list(s / cnt ORDER BY d) AS mvec
          FROM pm$i GROUP BY 1, 2
        ) m ON p.sub = m.sub AND p.code = m.code
      )"""

  /** The PQ machinery CTEs shared by the flat-PQ (sm7) and IVF-PQ (sm8)
    * mirrors: subspace explode → stride seed → $PqIters vectorized Lloyd
    * rounds → encode argmax → quantized ADC tables. Every multi-term
    * double sum is grid-quantized on both sides, so the chain is
    * engine-exact end to end.
    */
  private def pqCommonCtes: String = s"""
      WITH pq_csubs AS (
        SELECT e.vec_id AS corpus_id, s.sub,
          list_slice(e.embedding, s.sub * $PqSubDim + 1,
                     s.sub * $PqSubDim + $PqSubDim) AS sv
        FROM embeddings e,
          (SELECT unnest(generate_series(0, ${PqM - 1})) AS sub) s
      ), pq_seed AS (
        SELECT id, code FROM (
          SELECT id, ROW_NUMBER() OVER (ORDER BY id) - 1 AS code
          FROM (
            SELECT vec_id AS id FROM embeddings
            WHERE vec_id % greatest(CAST(ceil(
              (SELECT COUNT(*) FROM embeddings) / $PqCodebook.0) AS BIGINT),
              1) = 0
          )
        ) WHERE code < $PqCodebook
      ), books0 AS (
        SELECT cs.sub, sd.code,
          list_transform(cs.sv, x -> x::DOUBLE) AS cw
        FROM pq_seed sd JOIN pq_csubs cs ON cs.corpus_id = sd.id
      ), ${(1 to PqIters).map(i =>
        pqRoundSql(i, s"books${i - 1}")).mkString(", ")}, codebooks AS (
        SELECT sub, code, cw,
          floor(${dotNSql("cw", "cw", PqSubDim)} * $Grid) / $Grid AS cwn2
        FROM books$PqIters
      ), codes AS (
        SELECT corpus_id, sub, code, cwn2 FROM (
          SELECT corpus_id, sub, code, cwn2,
            ROW_NUMBER() OVER (PARTITION BY corpus_id, sub
                               ORDER BY s DESC, code) AS r
          FROM (
            SELECT cs.corpus_id, cs.sub, b.code, b.cwn2,
              ${dotNSql("cs.sv", "b.cw", PqSubDim)} / sqrt(b.cwn2) AS s
            FROM pq_csubs cs JOIN codebooks b ON cs.sub = b.sub
          )
        ) WHERE r = 1
      ), cnorm AS (
        SELECT corpus_id, sqrt(SUM(cwn2)) AS xn FROM codes GROUP BY 1
      ), qsubs AS (
        SELECT corpus_id AS query_id, sub, sv FROM pq_csubs
        WHERE corpus_id < $NQueries
      ), qnorms AS (
        SELECT vec_id AS query_id,
          sqrt(${dotSql("embedding", "embedding")}) AS qn
        FROM embeddings WHERE vec_id < $NQueries
      ), adc AS (
        SELECT q.query_id, n.qn, b.sub, b.code,
          floor(${dotNSql("q.sv", "b.cw", PqSubDim)} * $Grid) / $Grid AS pd
        FROM qsubs q
        JOIN qnorms n ON q.query_id = n.query_id
        JOIN codebooks b ON q.sub = b.sub
      )"""

  /** ADC-rank + exact-rerank tail shared by sm7/sm8; reads CTE `agg`
    * (query_id, qn, corpus_id, sd, nparts).
    */
  private def pqRankTail: String = s""", scored AS (
        SELECT query_id, corpus_id, sd / (qn * xn) AS approx_cos
        FROM agg JOIN cnorm USING (corpus_id)
        WHERE nparts = $PqM AND query_id != corpus_id
      ), adc_ranked AS (
        SELECT query_id, corpus_id,
          ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY approx_cos DESC, corpus_id) AS r
        FROM scored
      ), exact AS (
        SELECT c.query_id, c.corpus_id,
          ${cosSql("q.embedding", "e.embedding")} AS cos
        FROM adc_ranked c
        JOIN embeddings q ON q.vec_id = c.query_id
        JOIN embeddings e ON e.vec_id = c.corpus_id
        WHERE c.r <= $PqRerank
      ), reranked AS (
        SELECT query_id, corpus_id, cos,
          ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY cos DESC, corpus_id) AS rank
        FROM exact
      )
      SELECT query_id, corpus_id, cos, rank FROM reranked
      WHERE rank <= $K ORDER BY query_id, rank"""

  /** Full mirror of `Similarity.pqTopK`: flat PQ — every corpus vector
    * is an ADC candidate.
    */
  private def pqSql: String = s"""$pqCommonCtes, agg AS (
        SELECT t.query_id, t.qn, c.corpus_id,
          SUM(t.pd) AS sd, COUNT(*) AS nparts
        FROM codes c JOIN adc t ON c.sub = t.sub AND c.code = t.code
        GROUP BY 1, 2, 3
      )$pqRankTail"""

  /** Full mirror of `Similarity.ivfPqTopK`: the stride coarse quantizer
    * (sm4's shape) restricts candidates to each query's $IvfPqProbe
    * nearest cells; ADC scores only candidate pairs.
    */
  private def ivfPqSql: String = s"""$pqCommonCtes, cents AS (
        SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings
        WHERE vec_id % greatest(CAST(ceil(
          (SELECT COUNT(*) FROM embeddings) / $IvfPqCentroids.0) AS BIGINT),
          1) = 0
      ), corpus_cells AS (
        SELECT corpus_id, centroid_id FROM (
          SELECT corpus_id, centroid_id,
            ROW_NUMBER() OVER (PARTITION BY corpus_id
                               ORDER BY cs DESC, centroid_id) AS cr
          FROM (
            SELECT c.vec_id AS corpus_id, ct.centroid_id,
              ${cosSql("c.embedding", "ct.cvec")} AS cs
            FROM embeddings c, cents ct
          )
        ) WHERE cr = 1
      ), query_cells AS (
        SELECT query_id, centroid_id FROM (
          SELECT query_id, centroid_id,
            ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cs DESC, centroid_id) AS cr
          FROM (
            SELECT q.vec_id AS query_id, ct.centroid_id,
              ${cosSql("q.embedding", "ct.cvec")} AS cs
            FROM embeddings q, cents ct WHERE q.vec_id < $NQueries
          )
        ) WHERE cr <= $IvfPqProbe
      ), cand AS (
        SELECT query_id, corpus_id
        FROM corpus_cells JOIN query_cells USING (centroid_id)
      ), agg AS (
        SELECT t.query_id, t.qn, c.corpus_id,
          SUM(t.pd) AS sd, COUNT(*) AS nparts
        FROM codes c
        JOIN cand ca ON c.corpus_id = ca.corpus_id
        JOIN adc t ON t.query_id = ca.query_id
          AND c.sub = t.sub AND c.code = t.code
        GROUP BY 1, 2, 3
      )$pqRankTail"""
}
