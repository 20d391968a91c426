package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.Hash60
import graft.pack.Packing
import graft.sim.Similarity
import graft.text.TextFunctions

/** Corpus-preparation queries over `documents` — the steps between a curated
  * corpus and a training run: sequence packing into fixed token budgets,
  * deterministic stratified sampling for data mixing, and repeated-shingle
  * boilerplate scoring. Every expression has an exact DuckDB twin.
  */
object CorpusQueries {

  /** Tokens per context window. */
  private val PackBudget = 1000L

  /** Docs per prefix-sum bucket — at corpus scale this is sized so
    * `n / PackBucketWidth` (the single-task cumsum input) stays ~1e5.
    * Small here so the sf0.01 gate exercises many buckets.
    */
  private val PackBucketWidth = 50L

  /** A shingle is boilerplate when `df * CommonDocDenom >= n_docs`, i.e. it
    * appears in ≥ 1/CommonDocDenom of all documents. Integer cross-multiply:
    * a fractional literal (0.2) would be DECIMAL in DuckDB but a
    * round-to-nearest double in Spark, and `0.2 * n` can straddle a
    * representability boundary.
    */
  private val CommonDocDenom = 5

  /** Per-mille keep rates per language stratum (mixing weights). */
  private def mixRate = when(col("lang") === "en", 400)
    .when(col("lang") === "zh", 300)
    .otherwise(800)

  /** DuckDB token-array length — mirror of [[TextFunctions.tokenCount]]. */
  private val NT = raw"len(regexp_split_to_array(trim(lower(text)), '\s+'))"

  /** Context-window chunking: tokens per chunk / overlapped stride. */
  private val ChunkSize = 32
  private val ChunkOverlap = 8
  private val ChunkStride = ChunkSize - ChunkOverlap

  /** Quantization grid for per-term log-probabilities: round(x * 2^20) /
    * 2^20 keeps every addend an exact multiple of 2^-20, so per-document
    * double sums are EXACT and therefore order-independent — Spark's
    * parallel aggregation and DuckDB's sequential one cannot disagree.
    * (Scaling by a power of two is exact; only the shared ln() result feeds
    * in.) round — not floor — to the grid: Java's Math.log and DuckDB's
    * libm may differ by 1 ulp, and floor flips a whole grid step whenever
    * ln(x)*2^20 lands within that ulp of an integer; rounding to the
    * NEAREST grid point means a 1-ulp input wobble can only matter in the
    * measure-zero case of landing half-way between grid points.
    */
  private val LogGrid = 1048576L

  /** DSIR hashed-feature space: terms hash into this many buckets; the
    * importance weight is a log-ratio of Laplace-smoothed bucket
    * distributions. Small enough that both distribution tables broadcast.
    */
  private val DsirBuckets = 256L
  private val DsirTargetLang = "en"
  private val DsirKeep = 100

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // DATASET CARD — the one-row release summary every published training
    // corpus ships (docs/tokens/languages/sources, exact-duplicate mass,
    // median document length): the practical artifact that composes the
    // corpus instruments into a signable statement. Everything is exact:
    // counts, a ppm duplication ratio (dd1's normalized fingerprint), the
    // lower-median length from the compressed length table, and the
    // deterministic top language (count desc, name asc). Scale shape:
    // two corpus hash aggs (stats + fingerprints) and bounded reductions
    // — the card costs two scans regardless of corpus size.
    "cur18_dataset_card" -> ((s, dir) => {
      val base = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          TextFunctions.tokenCount(col("text")).as("n_tokens"),
          md5(regexp_replace(lower(trim(col("text"))), "\\s+", " "))
            .as("fp"))
      val core = base.agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars_total"),
        sum(col("n_tokens")).as("n_tokens_total"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"))
      val topLang = base.groupBy(col("lang")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("lang")).limit(1)
        .select(col("lang").as("top_lang"), col("c").as("top_lang_docs"))
      val dup = base.groupBy(col("fp")).agg(count(lit(1)).as("sz"))
        .agg(sum(when(col("sz") > 1, col("sz")).otherwise(0L))
          .as("dup_docs"))
      val byLen = base.select(col("n_chars").as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("c"))
      // bounded global window: one row per distinct document length
      val byV = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val n = base.agg(count(lit(1)).as("n"))
      val med = byLen.withColumn("cum", sum(col("c")).over(byV))
        .crossJoin(broadcast(n))
        .filter(col("cum") >= expr("(n + 1) div 2"))
        .agg(min(col("v")).as("p50_chars"))
      core.crossJoin(broadcast(topLang)).crossJoin(broadcast(dup))
        .crossJoin(broadcast(med))
        .select(col("n_docs"), col("n_chars_total"), col("n_tokens_total"),
          col("n_langs"), col("n_sources"), col("top_lang"),
          col("top_lang_docs"),
          expr("dup_docs * 1000000 div n_docs").as("dup_ratio_ppm"),
          col("p50_chars"))
    }),

    // STREAMING dataset card driver-gated: cur18's additive fields
    // maintained as a standing store (two manifest-committed merges over
    // disjoint halves, exactly-once), read back as the card — which must
    // equal the one-shot recompute the oracle runs over all documents.
    // See streaming.CorpusCardStore.
    "ev15_stream_corpus_card" -> ((s, dir) => {
      val root = graft.streaming.CorpusCardStore
        .materializedDocsCardDir(s, dir)
      graft.streaming.CorpusCardStore.report(s, root)
    }),

    // Sequence packing: each document's global token start offset and its
    // budget-sized pack — computed as a distributed prefix sum (bucket
    // totals + tiny cumsum + partitioned within-bucket window), never a
    // corpus-sized single-task window. graft.pack.Packing documents the
    // scale story.
    "pk1_doc_packing" -> ((s, dir) => {
      val toks = Tables(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("n_tokens"))
      Packing.packByBudget(toks, "doc_id", "n_tokens",
          PackBudget, PackBucketWidth)
        .select(col("doc_id"), col("n_tokens"), col("start_offset"),
          col("pack_id"))
        .orderBy(col("doc_id"))
    }),

    // LENGTH-GROUPED BATCHING (padding-waste minimization): sort docs by
    // length, cut into fixed-size batches, report each batch's padding
    // overhead (batch pads to its max length) — the standard dataloader
    // trick whose win this query QUANTIFIES. The global length rank runs
    // as the PrefixSum two-phase decomposition (length-range buckets →
    // partitioned window), so nothing is single-task over the corpus; the
    // batch id is then a pure function of the rank.
    "pk3_length_batching" -> ((s, dir) => {
      val B = 32
      val ranked = graft.pack.PrefixSum.globalRowNumber(
        Tables(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        expr("(-n_chars) div 64"),
        Seq(col("n_chars").desc, col("doc_id")), "rank")
      ranked.withColumn("batch", expr(s"(rank - 1) div $B"))
        .groupBy(col("batch"))
        .agg(count(lit(1)).as("n_docs"),
          max(col("n_chars")).as("max_len"),
          min(col("n_chars")).as("min_len"),
          sum(col("n_chars")).as("sum_len"))
        .withColumn("padding",
          col("max_len") * col("n_docs") - col("sum_len"))
        .orderBy(col("batch"))
    }),

    // Deterministic stratified sampling for data mixing: per-language
    // keep rates applied via a salted 60-bit md5 hash of the doc id, so
    // the sample is reproducible, resample-stable (a doc's fate never
    // depends on other rows), and a pure scan-side filter — no shuffle,
    // no RNG state, safe to re-run incrementally at any scale.
    "cur3_stratified_sample" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .withColumn("bucket",
          Hash60(concat(lit("mix:"), col("doc_id").cast("string"))) % 1000)
        .filter(col("bucket") < mixRate)
        .select(col("doc_id"), col("lang"), col("bucket"))
        .orderBy(col("doc_id"))),

    // Per-domain cap (data-mixing balance): keep at most DomainCap docs
    // per source, chosen by a salted hash of the doc id (deterministic,
    // order-independent — re-running on a grown corpus keeps a stable
    // preference order rather than "first K by arrival"). The filter
    // directly above row_number lets Spark plan a WindowGroupLimit:
    // each map task pre-limits to K rows per source BEFORE the shuffle,
    // so a monster domain (the classic web-crawl skew) contributes at
    // most K·tasks rows to the exchange, never its full document count.
    "cur5_domain_cap" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .withColumn("pri",
          Hash60(concat(lit("cap:"), col("doc_id").cast("string"))))
        .withColumn("rnk", row_number().over(Window
          .partitionBy(col("source"))
          .orderBy(col("pri"), col("doc_id"))).cast("long"))
        .filter(col("rnk") <= DecontamQueries.DomainCap)
        .select(col("doc_id"), col("source"), col("rnk"))
        .orderBy(col("doc_id"))),

    // Quality-weighted sampling: each doc kept with probability equal to
    // its quality score, decided by a salted hash bucket on the 2^20 grid
    // — the deterministic form of importance sampling every mixing recipe
    // uses to up-weight high-quality data. Same properties as cur3: pure
    // scan-side filter, resample-stable, no RNG state, re-runnable
    // incrementally at any scale.
    "cur6_weighted_sample" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.qualityScore(col("text")).as("quality"))
        .withColumn("bucket",
          Hash60(concat(lit("wsample:"), col("doc_id").cast("string")))
            % (1L << 20))
        .filter(col("bucket") < floor(col("quality") * (1L << 20)))
        .select(col("doc_id"), col("quality"), col("bucket"))
        .orderBy(col("doc_id"))),

    // Shard plan — the pipeline's LAST step: every document lands in one
    // of 16 balanced output shards by salted id-hash (stable under
    // re-runs and upstream partitioning; expected imbalance
    // O(sqrt(docs/shard))). The gate checks the full assignment via
    // per-shard doc and token totals; Shards.write publishes the physical
    // shard dirs under one atomic manifest (spec-verified).
    "cur10_shard_plan" -> ((s, dir) =>
      graft.pack.Shards.assign(Tables(s, dir, "documents"), "doc_id", 16)
        .groupBy(col("__shard").as("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text")).cast("long"))
            .as("sum_tokens"))
        .orderBy(col("shard"))),

    // Temperature-rebalanced domain mixture (the multilingual-LM α=0.5
    // recipe): per-domain keep rates ∝ sqrt(domain size), normalized to
    // retain half the corpus, applied as the same deterministic hash-bucket
    // filter as cur6. sqrt on integer counts is correctly rounded in every
    // IEEE engine, the weight sum is exact (weights floor-quantized to the
    // 2^20 grid, summed as integers), and the rate arithmetic is written in
    // one fixed association order on both sides — so the sampled set is
    // bit-reproducible cross-engine. Shape: domain stats are a tiny agg
    // broadcast back over the scan; the filter itself is scan-side, no
    // shuffle of the corpus at any scale.
    "cur8_domain_mixture" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").select(col("doc_id"), col("source"))
      val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("c"))
        .withColumn("wq",
          floor(sqrt(col("c").cast("double")) * (1L << 20)).cast("long"))
      val tot = counts.agg(sum(col("c")).as("n"), sum(col("wq")).as("sumw"))
      val rates = counts.crossJoin(broadcast(tot))
        .withColumn("rate", least(lit(1.0),
          lit(0.5) * col("n") * col("wq") / col("sumw") / col("c")))
      val kept = docs
        .join(broadcast(rates.select(col("source"), col("rate"))), Seq("source"))
        .withColumn("bucket",
          Hash60(concat(lit("mix8:"), col("doc_id").cast("string")))
            % (1L << 20))
        .filter(col("bucket") < floor(col("rate") * (1L << 20)))
        .groupBy(col("source")).agg(count(lit(1)).as("kept"))
      rates.join(kept, Seq("source"), "left")
        .select(col("source"), col("c").as("n_docs"),
          coalesce(col("kept"), lit(0L)).as("kept"),
          (floor(col("rate") * (1L << 20)) / lit(1048576.0)).as("rate_q"))
        .orderBy(col("source"))
    }),

    // Boilerplate fraction (CCNet-style): the share of a document's
    // distinct 3-gram shingles that are corpus-common (df ≥ 20% of docs).
    // Explode → shingle doc-freq (one hash-agg shuffle, map-side
    // combined), threshold against a broadcast scalar N, join the small
    // common set back, re-aggregate per doc. The common set is small by
    // construction (high-df shingles are few), so the join side stays
    // broadcastable at any corpus size.
    "tx8_boilerplate_frac" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val ex = docs.select(col("doc_id"),
        explode(TextFunctions.shingles(col("text"), 3)).as("shingle"))
      val dfreq = ex.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val common = dfreq.crossJoin(broadcast(n))
        .filter(col("df") * CommonDocDenom >= col("n_docs"))
        .select(col("shingle"), lit(1).as("is_common"))
      ex.join(common, Seq("shingle"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          count(col("is_common")).as("n_common"))
        .withColumn("boiler_frac",
          col("n_common").cast("double") / col("n_shingles"))
        .orderBy(col("doc_id"))
    }),

    // Overlapped context-window chunking: split each document's token
    // stream into ChunkSize-token windows advancing by ChunkStride, with
    // the chunk text materialized from the token array. Pure narrow
    // explode — no shuffle; chunk count is integer arithmetic (DIV), so
    // both engines agree exactly.
    "pk2_doc_chunks" -> ((s, dir) => {
      val withToks = Tables(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
        .withColumn("n_tokens", size(col("t")))
        .withColumn("n_chunks", expr(
          s"greatest((n_tokens - $ChunkOverlap + ${ChunkStride - 1})" +
            s" DIV $ChunkStride, 1)"))
      withToks
        .select(col("doc_id"), col("t"), col("n_tokens"),
          explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
        .withColumn("chunk_start", col("chunk_idx") * ChunkStride)
        .withColumn("chunk_len",
          least(lit(ChunkSize), col("n_tokens") - col("chunk_start")))
        .select(col("doc_id"), col("chunk_idx"), col("chunk_start"),
          col("chunk_len"),
          array_join(slice(col("t"), (col("chunk_start") + 1).cast("int"),
            col("chunk_len").cast("int")), " ").as("chunk_text"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // DSIR-style importance resampling (Xie et al. 2023, arXiv:2302.03169):
    // score every raw document by how target-like its hashed-unigram
    // distribution is — per-bucket log(p_target / p_raw) with Laplace
    // smoothing — then keep the top-N by mean log-ratio. The deterministic
    // skeleton of "Data Selection for Language Models via Importance
    // Resampling": hashed n-gram features, bag-of-features importance
    // weight, selection by weight (the paper adds Gumbel noise; a
    // reproducible gate cannot, and top-N is the noise-free limit).
    // Scale shape: the feature space is FIXED (DsirBuckets rows), so both
    // distribution tables and the log-ratio table broadcast; per-doc
    // scoring is one broadcast join + hash-agg over the token stream; the
    // global top-N is TakeOrdered (never a single-partition window), and
    // the selected-id set (N rows) broadcasts back for the flag join.
    // Cross-engine: ln() results are quantized to the 2^-20 grid per
    // BUCKET (see LogGrid), so per-doc sums are exact in any order.
    "cur11_dsir_sample" -> ((s, dir) => {
      // Features are hashed unigrams AND word-bigrams, as in the paper —
      // on this corpus (identical 31-token vocabulary across languages,
      // only frequencies differ) bigram evidence lifts the selected
      // target-language fraction from 0.54 to 0.76 at sf0.001.
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextFunctions.tokens(col("text")).as("t"))
      val uni = docs.select(col("doc_id"), col("lang"),
        explode(col("t")).as("f"))
      val bi = docs.select(col("doc_id"), col("lang"),
        explode(zip_with(
          slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1),
          (a, b) => concat(a, lit(" "), b))).as("f"))
      val toks = uni.unionAll(bi)
        .withColumn("b", pmod(Hash60(col("f")), lit(DsirBuckets)))
        .select(col("doc_id"), col("lang"), col("b"))
      // both distributions in ONE conditional aggregation over the token
      // stream (r12 optimization round, guide §2.3 "aggregate before you
      // shuffle"): the r11 shape ran two separate aggs (raw + target-
      // filtered) over the same explode and left-joined them back — one
      // extra full tokenize+explode pass and a bucket-table join for the
      // same integers (ct with no target rows was NULL→coalesce 0; the
      // conditional sum lands 0 directly).
      val dist = toks.groupBy(col("b")).agg(count(lit(1)).as("cr"),
        sum(when(col("lang") === DsirTargetLang, 1L).otherwise(0L))
          .as("ct"))
      val tot = dist.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
      val lr = dist.crossJoin(broadcast(tot))
        .select(col("b"),
          ((round(log((col("ct") + 1).cast("double") /
              (col("nt") + DsirBuckets)) * LogGrid, 0) / LogGrid) -
           (round(log((col("cr") + 1).cast("double") /
              (col("nr") + DsirBuckets)) * LogGrid, 0) / LogGrid)).as("lr"))
      val perDoc = toks.join(broadcast(lr), Seq("b"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_feats"), sum(col("lr")).as("s"))
        .select(col("doc_id"), col("n_feats"),
          (col("s") / col("n_feats")).as("avg_log_ratio"))
      val top = perDoc
        .orderBy(col("avg_log_ratio").desc, col("doc_id"))
        .limit(DsirKeep)
        .select(col("doc_id"), lit(1).as("sel"))
      perDoc.join(broadcast(top), Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_feats"), col("avg_log_ratio"),
          coalesce(col("sel"), lit(0)).cast("int").as("selected"))
        .orderBy(col("doc_id"))
    }),

    // Unigram language-model quality score: mean ln p(token) under the
    // corpus's own unigram distribution (the cheap KenLM-style perplexity
    // proxy every curation pipeline runs). Term frequencies are one
    // hash-agg; the corpus total rides a broadcast scalar; per-term log
    // probabilities are quantized to the 2^-20 grid (see LogGrid) so the
    // per-document sum is exact under any aggregation order.
    "tx9_unigram_logprob" -> ((s, dir) => {
      val toks = Tables(s, dir, "documents")
        .select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("term"))
      // ONE tokenize pass (r12 optimization round): the per-(doc, term)
      // multiplicity table feeds BOTH the term-frequency model and the
      // scoring join (the r11 shape re-tokenized the corpus for each);
      // the lineage cut materializes the compressed table once. Scoring
      // weights each term's grid-quantized logp by its multiplicity —
      // m·(k/2^20) is exact in a double, so the per-doc sum is
      // bit-identical to the per-instance sum it replaces.
      val gDoc = graft.graph.GraphOps.checkpoint(
        toks.groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("m")))
      val tf = gDoc.groupBy(col("term")).agg(sum(col("m")).as("c"))
      val tot = tf.agg(sum(col("c")).as("t"))
      val logp = tf.crossJoin(broadcast(tot))
        .select(col("term"),
          (round(log(col("c").cast("double") / col("t")) * LogGrid, 0) /
            LogGrid).as("logp"))
      gDoc.join(logp, Seq("term"))
        .groupBy(col("doc_id"))
        .agg(sum(col("m")).as("n_tokens"),
          sum(col("m") * col("logp")).as("sum_logp"))
        .select(col("doc_id"), col("n_tokens"),
          (col("sum_logp") / col("n_tokens")).as("avg_logprob"))
        .orderBy(col("doc_id"))
    }),

    // Interpolated BIGRAM language-model score — the KenLM-style upgrade
    // of tx9: p(w|prev) = λ·(c₂(prev,w)/c₂(prev,·)) + (1-λ)·(c₁(w)/N),
    // first tokens scored by the unigram term alone. Jelinek-Mercer
    // interpolation is the simplest smoothing that needs no discount
    // tuning and never yields log(0). Both probability tables are
    // vocab-bounded (c₁: |V|, c₂: ≤|V|²) → broadcast joins against the
    // token stream; per-(prev,w) log values are grid-quantized (LogGrid)
    // so per-doc sums are exact under any aggregation order.
    "tx16_bigram_lm" -> ((s, dir) => {
      val lam = 0.7
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
      val tok = docs
        .select(col("doc_id"), posexplode(col("t")).as(Seq("pos", "w")),
          col("t"))
        // element_at is 1-based, so t[pos] IS the previous token
        .withColumn("prev",
          when(col("pos") > 0, element_at(col("t"), col("pos"))))
        .select(col("doc_id"), col("prev"), col("w"))
      // ONE tokenize pass (r12 optimization round): the r11 shape
      // re-tokenized the corpus FOUR times (unigram counts, bigram
      // counts, and one scoring branch per tok half). The per-(doc,
      // prev, w) multiplicity table is lineage-cut once; the count
      // tables re-aggregate it (same integers), and scoring is ONE
      // null-safe-keyed join against the union of both probability
      // tables (a first token's prev is null on both sides) weighted by
      // multiplicity — m·(k/2^20) is exact in a double, so per-doc sums
      // are bit-identical to the per-instance sums they replace.
      val gDoc = graft.graph.GraphOps.checkpoint(
        tok.groupBy(col("doc_id"), col("prev"), col("w"))
          .agg(count(lit(1)).as("m")))
      val c1 = gDoc.groupBy(col("w")).agg(sum(col("m")).as("c"))
      val n = c1.agg(sum(col("c")).as("n"))
      val c2 = gDoc.filter(col("prev").isNotNull)
        .groupBy(col("prev"), col("w")).agg(sum(col("m")).as("c2"))
      val cs = c2.groupBy(col("prev")).agg(sum(col("c2")).as("cs"))
      val p1 = c1.crossJoin(broadcast(n))
        .select(lit(null).cast("string").as("prev"), col("w"),
          (round(log(col("c").cast("double") / col("n")) * LogGrid, 0) /
            LogGrid).as("lp"))
      // No broadcast hints: p1 is |V| rows and p2 is O(observed bigrams)
      // — bounded at fixture scale (AQE broadcasts them) but corpus-sized
      // in the worst case at 100 TB, where these must be shuffle joins.
      val p2 = c2.join(cs, Seq("prev")).join(c1, Seq("w"))
        .crossJoin(broadcast(n))
        .select(col("prev"), col("w"),
          (round(log(lit(lam) * (col("c2").cast("double") / col("cs")) +
            lit(1 - lam) * (col("c").cast("double") / col("n"))) * LogGrid,
            0) / LogGrid).as("lp"))
      val p = p1.unionByName(p2)
      // explicit aliases: p shares lineage with gDoc (its attributes carry
      // gDoc's expression ids through the aggregates and unionByName), so
      // resolution must not depend on dataset-id self-join disambiguation
      // (r13, advisor item)
      gDoc.as("d").join(p.as("pp"),
          col("d.prev") <=> col("pp.prev") && col("d.w") === col("pp.w"))
        .groupBy(col("doc_id"))
        .agg(sum(col("m")).as("n_tokens"),
          sum(col("m") * col("lp")).as("s"))
        .select(col("doc_id"), col("n_tokens"),
          (col("s") / col("n_tokens")).as("avg_logprob"))
        .orderBy(col("doc_id"))
    }),

    // KNESER-NEY bigram scoring (Kneser & Ney, ICASSP '95; the smoothing
    // inside KenLM, whose perplexity is THE standard pretraining-corpus
    // quality filter — CCNet, Wenzek et al. 2020). Upgrades tx16's
    // Jelinek-Mercer mix with absolute discounting + CONTINUATION
    // counts: P(w|prev) = (c(prev,w) − D)/c(prev·) +
    // D·N1+(prev·)/c(prev·) · N1+(·w)/|bigram types|, D = 0.75. Every
    // count is an exact integer (self-scoring corpus ⇒ every scored
    // bigram has c ≥ 1 > D, so the discount never clips and the log
    // argument is positive); the log is grid-rounded per the LogGrid
    // discipline so per-doc sums are exact in any order. Same join
    // shape as tx16 — two hash-agg count tables plus two
    // continuation-count aggs, no new scale surface.
    "tx35_kneser_ney" -> ((s, dir) => {
      val D = 0.75
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
      val tok = docs
        .select(col("doc_id"), posexplode(col("t")).as(Seq("pos", "w")),
          col("t"))
        .withColumn("prev",
          when(col("pos") > 0, element_at(col("t"), col("pos"))))
        .select(col("doc_id"), col("prev"), col("w"))
      // ONE tokenize pass + multiplicity-weighted scoring via a single
      // null-safe-keyed join — same restructure as tx16 (see there for
      // the bit-exactness argument); every count table re-aggregates the
      // lineage-cut per-(doc, prev, w) table to the same integers.
      val gDoc = graft.graph.GraphOps.checkpoint(
        tok.groupBy(col("doc_id"), col("prev"), col("w"))
          .agg(count(lit(1)).as("m")))
      val c1 = gDoc.groupBy(col("w")).agg(sum(col("m")).as("c"))
      val n = c1.agg(sum(col("c")).as("n"))
      val c2 = gDoc.filter(col("prev").isNotNull)
        .groupBy(col("prev"), col("w")).agg(sum(col("m")).as("c2"))
      // n1p = N1+(prev ·): distinct continuations of prev
      val cs = c2.groupBy(col("prev"))
        .agg(sum(col("c2")).as("cs"), count(lit(1)).as("n1p"))
      // cont = N1+(· w): distinct predecessors of w
      val cont = c2.groupBy(col("w")).agg(count(lit(1)).as("cont"))
      val btypes = c2.agg(count(lit(1)).as("btypes"))
      val p1 = c1.crossJoin(broadcast(n))
        .select(lit(null).cast("string").as("prev"), col("w"),
          (round(log(col("c").cast("double") / col("n")) * LogGrid, 0) /
            LogGrid).as("lp"))
      val p2 = c2.join(cs, Seq("prev")).join(cont, Seq("w"))
        .crossJoin(broadcast(btypes))
        .select(col("prev"), col("w"),
          (round(log(
            (col("c2").cast("double") - lit(D)) / col("cs").cast("double") +
            lit(D) * col("n1p").cast("double") / col("cs").cast("double") *
              (col("cont").cast("double") / col("btypes").cast("double"))) *
            LogGrid, 0) / LogGrid).as("lp"))
      val p = p1.unionByName(p2)
      // explicit aliases: p shares lineage with gDoc (its attributes carry
      // gDoc's expression ids through the aggregates and unionByName), so
      // resolution must not depend on dataset-id self-join disambiguation
      // (r13, advisor item)
      gDoc.as("d").join(p.as("pp"),
          col("d.prev") <=> col("pp.prev") && col("d.w") === col("pp.w"))
        .groupBy(col("doc_id"))
        .agg(sum(col("m")).as("n_tokens"),
          sum(col("m") * col("lp")).as("s"))
        .select(col("doc_id"), col("n_tokens"),
          (col("s") / col("n_tokens")).as("avg_logprob"))
        .orderBy(col("doc_id"))
    }),

    // Character-trigram Shannon entropy — the gibberish/template signal
    // quality filters cut on (low entropy = repeated boilerplate, high =
    // random noise; natural text sits in a band). Entropy is a
    // PER-DOCUMENT function, so it runs as ONE scan-side codegen struct
    // ([[graft.functions.CharNgramEntropy]]) — zero shuffles; the
    // relational explode+groupBy form moves ~n_chars rows per doc through
    // an exchange to compute the same number (measured 3.2 s → scan cost
    // at sf0.1). Addends are grid-quantized inside the kernel, so the
    // DuckDB oracle's relational recompute lands on identical doubles.
    "tx17_char_entropy" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), lower(trim(col("text"))).as("t"))
        .filter(length(col("t")) >= 3)
        .select(col("doc_id"),
          graft.functions.CharNgramEntropy(col("t"), 3).as("e"))
        .select(col("doc_id"), col("e.n_grams").as("n_grams"),
          col("e.n_distinct").as("n_distinct"),
          col("e.entropy").as("entropy"))
        .orderBy(col("doc_id"))),

    // Within-document repetition (Gopher-rule signal): the fraction of a
    // document's 3-gram positions occupied by a repeated shingle. Narrow
    // codegen'd projection — the distinct count comes straight off the
    // native word_ngrams kernel, no explode.
    "tx10_repetition" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          size(graft.text.WordNGrams(col("text"), 3)).as("distinct_3grams"),
          greatest(TextFunctions.tokenCount(col("text")) - 2, lit(1))
            .as("total_3grams"))
        .withColumn("dup_frac",
          lit(1.0) - col("distinct_3grams").cast("double") /
            col("total_3grams"))
        .orderBy(col("doc_id"))),

    // The COMPOSED end-to-end preprocessing pipeline: curation filter
    // (quality/length/lang-agreement) → exact-duplicate collapse →
    // MinHash near-dup drop → embedding-cosine semantic near-dup drop →
    // sequence packing of the survivors. One DAG from raw corpus to
    // training-ready packs, every stage the same library call the
    // standalone gates use — this is the query a real pretraining run
    // executes.
    "cur4_pipeline" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      // ONE text pass for every per-doc scalar the curation and
      // exact-dedup stages consume (r12 optimization round: each stage
      // re-ran its text kernels over the corpus); the lineage-cut table
      // is 6 narrow scalars per doc. The near-dup/semantic stages keep
      // their library shapes (their signature passes shuffle hashed
      // grams, not text). Same keep set: the fingerprint window below
      // IS Dedup.dropExactDuplicates' formulation over the precomputed
      // fp column.
      val perDoc = graft.graph.GraphOps.checkpoint(docs.select(
        col("doc_id"), col("lang"),
        TextFunctions.langId(col("text")).as("lang_pred"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        TextFunctions.qualityScore(col("text")).as("quality"),
        TextFunctions.fingerprint(col("text")).as("fp")))
      val curated = perDoc
        .filter(col("quality") >= 0.6 &&
          col("n_tokens").between(20, 2000) &&
          col("lang_pred") === col("lang"))
        .select(col("doc_id"), col("n_tokens"))
      val wFp = org.apache.spark.sql.expressions.Window
        .partitionBy(col("fp"))
      val exactKeep = perDoc
        .withColumn("__keep", min(col("doc_id")).over(wFp))
        .filter(col("doc_id") === col("__keep"))
        .select(col("doc_id"))
      val nearDrops = Dedup.nearDuplicatePairs(docs, "text", "doc_id",
          DedupQueries.JaccardTau, DedupQueries.ShingleN,
          DedupQueries.Bands, DedupQueries.RowsPerBand)
        .select(col("id_b").as("doc_id")).distinct()
      val semDrops = Similarity.cosineNearDupPairs(
          Tables(s, dir, "embeddings")
            .select(col("vec_id").as("id"), col("embedding").as("vec")),
          SimQueries.NearDupTau, SimQueries.NPlanes, SimQueries.Dim)
        .select(col("id_b").as("doc_id")).distinct()
      val keep = curated
        .join(exactKeep, Seq("doc_id"), "left_semi")
        .join(nearDrops, Seq("doc_id"), "left_anti")
        .join(semDrops, Seq("doc_id"), "left_anti")
      Packing.packByBudget(keep, "doc_id", "n_tokens",
          PackBudget, PackBucketWidth)
        .select(col("doc_id"), col("n_tokens"), col("start_offset"),
          col("pack_id"))
        .orderBy(col("doc_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "cur18_dataset_card" -> raw"""
      WITH base AS (
        SELECT doc_id, lang, source, n_chars,
          CAST($NT AS BIGINT) AS n_tokens,
          md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        FROM documents
      ), core AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(n_chars) AS BIGINT) AS n_chars_total,
          CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_total,
          CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
          CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
        FROM base
      ), top_lang AS (
        SELECT lang AS top_lang, CAST(COUNT(*) AS BIGINT)
          AS top_lang_docs
        FROM base GROUP BY lang
        ORDER BY COUNT(*) DESC, lang LIMIT 1
      ), dup AS (
        SELECT CAST(SUM(CASE WHEN sz > 1 THEN sz ELSE 0 END) AS BIGINT)
          AS dup_docs
        FROM (SELECT fp, COUNT(*) AS sz FROM base GROUP BY fp)
      ), med AS (
        SELECT CAST(MIN(v) AS BIGINT) AS p50_chars FROM (
          SELECT v, CAST(SUM(c) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum
          FROM (SELECT n_chars AS v, COUNT(*) AS c FROM base GROUP BY 1)),
          core
        WHERE cum >= (n_docs + 1) // 2
      )
      SELECT n_docs, n_chars_total, n_tokens_total, n_langs, n_sources,
        top_lang, top_lang_docs,
        CAST(dup_docs * 1000000 // n_docs AS BIGINT) AS dup_ratio_ppm,
        p50_chars
      FROM core, top_lang, dup, med""",

    "ev15_stream_corpus_card" -> raw"""
      WITH base AS (
        SELECT lang, source, n_chars, CAST($NT AS BIGINT) AS t
        FROM documents
      )
      SELECT dim, key, n FROM (
        SELECT 'total' AS dim, 'docs' AS key,
          CAST(COUNT(*) AS BIGINT) AS n FROM base
        UNION ALL
        SELECT 'total', 'chars', CAST(SUM(n_chars) AS BIGINT) FROM base
        UNION ALL
        SELECT 'total', 'tokens', CAST(SUM(t) AS BIGINT) FROM base
        UNION ALL
        SELECT 'lang', lang, CAST(COUNT(*) AS BIGINT) FROM base
        GROUP BY lang
        UNION ALL
        SELECT 'source', source, CAST(COUNT(*) AS BIGINT) FROM base
        GROUP BY source
      ) ORDER BY dim, key""",

    "pk1_doc_packing" -> s"""
      WITH toks AS (
        SELECT doc_id, $NT AS n_tokens FROM documents
      ), run AS (
        SELECT doc_id, n_tokens,
          CAST(SUM(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
            AS BIGINT) AS start_offset
        FROM toks
      )
      SELECT doc_id, n_tokens, start_offset,
        start_offset // $PackBudget AS pack_id
      FROM run ORDER BY doc_id""",

    "pk3_length_batching" -> """
      WITH ranked AS (
        SELECT doc_id, n_chars,
          CAST(ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id)
            AS BIGINT) AS rank
        FROM documents
      )
      SELECT (rank - 1) // 32 AS batch,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(MAX(n_chars) AS BIGINT) AS max_len,
        CAST(MIN(n_chars) AS BIGINT) AS min_len,
        CAST(SUM(n_chars) AS BIGINT) AS sum_len,
        CAST(MAX(n_chars) * COUNT(*) - SUM(n_chars) AS BIGINT) AS padding
      FROM ranked GROUP BY 1 ORDER BY batch""",

    "cur3_stratified_sample" -> """
      SELECT doc_id, lang, bucket FROM (
        SELECT doc_id, lang,
          ('0x' || substr(md5('mix:' || doc_id::VARCHAR), 1, 15))::BIGINT
            % 1000 AS bucket
        FROM documents)
      WHERE bucket < CASE lang WHEN 'en' THEN 400 WHEN 'zh' THEN 300
        ELSE 800 END
      ORDER BY doc_id""",

    "cur5_domain_cap" -> s"""
      SELECT doc_id, source, rnk FROM (
        SELECT doc_id, source,
          CAST(row_number() OVER (PARTITION BY source ORDER BY
            ('0x' || substr(md5('cap:' || doc_id::VARCHAR), 1, 15))::BIGINT,
            doc_id) AS BIGINT) AS rnk
        FROM documents)
      WHERE rnk <= ${DecontamQueries.DomainCap}
      ORDER BY doc_id""",

    "cur6_weighted_sample" -> s"""
      SELECT doc_id, quality, bucket FROM (
        SELECT doc_id, ${TextQueries.qualitySql} AS quality,
          ('0x' || substr(md5('wsample:' || doc_id::VARCHAR), 1, 15))::BIGINT
            % ${1L << 20} AS bucket
        FROM documents)
      WHERE bucket < CAST(floor(quality * ${1L << 20}) AS BIGINT)
      ORDER BY doc_id""",

    "cur10_shard_plan" -> raw"""
      SELECT ('0x' || substr(md5('shard:' || doc_id::VARCHAR), 1, 15))::BIGINT
          % 16 AS shard,
        COUNT(*) AS n_docs,
        CAST(SUM(len(regexp_split_to_array(trim(lower(text)), '\s+')))
          AS BIGINT) AS sum_tokens
      FROM documents GROUP BY 1 ORDER BY 1""",

    // Same fixed association order as the Spark rate expression:
    // ((((0.5 * n) * wq) / sumw) / c).
    "cur8_domain_mixture" -> s"""
      WITH c AS (
        SELECT source, COUNT(*) AS c,
          CAST(floor(sqrt(COUNT(*)) * ${1L << 20}) AS BIGINT) AS wq
        FROM documents GROUP BY source
      ), t AS (
        SELECT SUM(c) AS n, SUM(wq) AS sumw FROM c
      ), r AS (
        SELECT source, c, least(1.0, 0.5 * n * wq / sumw / c) AS rate
        FROM c, t
      ), k AS (
        SELECT d.source, COUNT(*) AS kept
        FROM documents d JOIN r USING (source)
        WHERE ('0x' || substr(md5('mix8:' || doc_id::VARCHAR), 1, 15))::BIGINT
            % ${1L << 20} < floor(rate * ${1L << 20})
        GROUP BY d.source
      )
      SELECT r.source, CAST(r.c AS BIGINT) AS n_docs,
        CAST(COALESCE(k.kept, 0) AS BIGINT) AS kept,
        floor(rate * ${1L << 20}) / 1048576.0 AS rate_q
      FROM r LEFT JOIN k USING (source) ORDER BY source""",

    "tx8_boilerplate_frac" -> s"""
      WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
        FROM documents
      ), sh AS (
        SELECT doc_id, list_distinct(list_transform(
          generate_series(1, greatest(len(t) - 2, 1)),
          i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS s
        FROM toks
      ), ex AS (
        SELECT doc_id, unnest(s) AS shingle FROM sh
      ), dfreq AS (
        SELECT shingle, COUNT(*) AS df FROM ex GROUP BY 1
      ), nd AS (
        SELECT COUNT(*) AS n_docs FROM documents
      ), common AS (
        SELECT shingle FROM dfreq, nd WHERE df * $CommonDocDenom >= n_docs
      )
      SELECT ex.doc_id, COUNT(*) AS n_shingles, COUNT(c.shingle) AS n_common,
        COUNT(c.shingle)::DOUBLE / COUNT(*) AS boiler_frac
      FROM ex LEFT JOIN common c ON ex.shingle = c.shingle
      GROUP BY ex.doc_id ORDER BY doc_id""",

    "pk2_doc_chunks" -> raw"""
      WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t,
          $NT AS n_tokens
        FROM documents
      ), chunked AS (
        SELECT doc_id, t, n_tokens,
          greatest((n_tokens - $ChunkOverlap + ${ChunkStride - 1})
            // $ChunkStride, 1) AS n_chunks
        FROM toks
      ), ex AS (
        SELECT doc_id, t, n_tokens,
          unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
        FROM chunked
      )
      SELECT doc_id, chunk_idx,
        chunk_idx * $ChunkStride AS chunk_start,
        least($ChunkSize, n_tokens - chunk_idx * $ChunkStride) AS chunk_len,
        array_to_string(list_slice(t, chunk_idx * $ChunkStride + 1,
          chunk_idx * $ChunkStride +
            least($ChunkSize, n_tokens - chunk_idx * $ChunkStride)), ' ')
          AS chunk_text
      FROM ex ORDER BY doc_id, chunk_idx""",

    "cur11_dsir_sample" -> raw"""
      WITH docs AS (
        SELECT doc_id, lang,
          regexp_split_to_array(trim(lower(text)), '\s+') AS t
        FROM documents
      ), feats AS (
        SELECT doc_id, lang, unnest(t) AS f FROM docs
        UNION ALL
        SELECT doc_id, lang,
          unnest(list_transform(generate_series(1, len(t) - 1),
            i -> t[i] || ' ' || t[i + 1])) AS f
        FROM docs
      ), tb AS (
        SELECT doc_id, lang,
          ('0x' || substr(md5(f), 1, 15))::BIGINT % $DsirBuckets AS b
        FROM feats
      ), rawd AS (
        SELECT b, COUNT(*) AS cr FROM tb GROUP BY 1
      ), tgtd AS (
        SELECT b, COUNT(*) AS ct FROM tb WHERE lang = '$DsirTargetLang'
        GROUP BY 1
      ), tot AS (
        SELECT (SELECT SUM(cr) FROM rawd) AS nr,
               (SELECT SUM(ct) FROM tgtd) AS nt
      ), lr AS (
        SELECT r.b,
          round(ln((COALESCE(t.ct, 0) + 1)::DOUBLE
                   / (tot.nt + $DsirBuckets)) * $LogGrid) / $LogGrid
          - round(ln((r.cr + 1)::DOUBLE
                     / (tot.nr + $DsirBuckets)) * $LogGrid) / $LogGrid AS lr
        FROM rawd r LEFT JOIN tgtd t USING (b), tot
      ), perdoc AS (
        SELECT doc_id, COUNT(*) AS n_feats, SUM(lr.lr) AS s
        FROM tb JOIN lr USING (b) GROUP BY 1
      ), pd AS (
        SELECT doc_id, n_feats, s / n_feats AS avg_log_ratio FROM perdoc
      ), top AS (
        SELECT doc_id, 1 AS sel FROM pd
        ORDER BY avg_log_ratio DESC, doc_id LIMIT $DsirKeep
      )
      SELECT pd.doc_id, pd.n_feats, pd.avg_log_ratio,
        CAST(COALESCE(top.sel, 0) AS INT) AS selected
      FROM pd LEFT JOIN top ON pd.doc_id = top.doc_id
      ORDER BY pd.doc_id""",

    "tx9_unigram_logprob" -> raw"""
      WITH toks AS (
        SELECT doc_id,
          unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        FROM documents
      ), tf AS (
        SELECT term, COUNT(*) AS c FROM toks GROUP BY 1
      ), tot AS (
        SELECT CAST(SUM(c) AS BIGINT) AS t FROM tf
      ), logp AS (
        SELECT term, round(ln(c::DOUBLE / t) * $LogGrid) / $LogGrid AS logp
        FROM tf, tot
      )
      SELECT doc_id, COUNT(*) AS n_tokens,
        SUM(logp) / COUNT(*) AS avg_logprob
      FROM toks JOIN logp USING (term)
      GROUP BY doc_id ORDER BY doc_id""",

    "tx16_bigram_lm" -> raw"""
      WITH docs AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        FROM documents
      ), pos AS (
        SELECT doc_id, unnest(generate_series(1, len(t))) AS i, t FROM docs
      ), tok AS (
        SELECT doc_id, t[i] AS w,
          CASE WHEN i > 1 THEN t[i - 1] ELSE NULL END AS prev
        FROM pos
      ), c1 AS (
        SELECT w, COUNT(*) AS c FROM tok GROUP BY 1
      ), n AS (
        SELECT SUM(c) AS n FROM c1
      ), c2 AS (
        SELECT prev, w, COUNT(*) AS c2 FROM tok
        WHERE prev IS NOT NULL GROUP BY 1, 2
      ), cs AS (
        SELECT prev, SUM(c2) AS cs FROM c2 GROUP BY 1
      ), p1 AS (
        SELECT w, round(ln(c::DOUBLE / n) * $LogGrid) / $LogGrid AS lp
        FROM c1, n
      ), p2 AS (
        SELECT c2.prev, c2.w,
          round(ln(0.7 * (c2.c2::DOUBLE / cs.cs)
                 + 0.3 * (c1.c::DOUBLE / n.n)) * $LogGrid) / $LogGrid AS lp
        FROM c2 JOIN cs USING (prev) JOIN c1 ON c2.w = c1.w, n
      ), scored AS (
        SELECT doc_id, p1.lp FROM tok JOIN p1 ON tok.w = p1.w
        WHERE tok.prev IS NULL
        UNION ALL
        SELECT doc_id, p2.lp FROM tok
        JOIN p2 ON tok.prev = p2.prev AND tok.w = p2.w
      )
      SELECT doc_id, COUNT(*) AS n_tokens,
        SUM(lp) / COUNT(*) AS avg_logprob
      FROM scored GROUP BY 1 ORDER BY doc_id""",

    "tx35_kneser_ney" -> raw"""
      WITH docs AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        FROM documents
      ), pos AS (
        SELECT doc_id, unnest(generate_series(1, len(t))) AS i, t FROM docs
      ), tok AS (
        SELECT doc_id, t[i] AS w,
          CASE WHEN i > 1 THEN t[i - 1] ELSE NULL END AS prev
        FROM pos
      ), c1 AS (
        SELECT w, COUNT(*) AS c FROM tok GROUP BY 1
      ), n AS (
        SELECT SUM(c) AS n FROM c1
      ), c2 AS (
        SELECT prev, w, COUNT(*) AS c2 FROM tok
        WHERE prev IS NOT NULL GROUP BY 1, 2
      ), cs AS (
        SELECT prev, SUM(c2) AS cs, COUNT(*) AS n1p FROM c2 GROUP BY 1
      ), cont AS (
        SELECT w, COUNT(*) AS cont FROM c2 GROUP BY 1
      ), bt AS (
        SELECT COUNT(*) AS btypes FROM c2
      ), p1 AS (
        SELECT w, round(ln(c::DOUBLE / n) * $LogGrid) / $LogGrid AS lp
        FROM c1, n
      ), p2 AS (
        SELECT c2.prev, c2.w,
          round(ln(
            (c2.c2::DOUBLE - 0.75) / cs.cs::DOUBLE
            + 0.75 * cs.n1p::DOUBLE / cs.cs::DOUBLE
              * (cont.cont::DOUBLE / bt.btypes::DOUBLE)) * $LogGrid)
            / $LogGrid AS lp
        FROM c2 JOIN cs USING (prev) JOIN cont ON c2.w = cont.w, bt
      ), scored AS (
        SELECT doc_id, p1.lp FROM tok JOIN p1 ON tok.w = p1.w
        WHERE tok.prev IS NULL
        UNION ALL
        SELECT doc_id, p2.lp FROM tok
        JOIN p2 ON tok.prev = p2.prev AND tok.w = p2.w
      )
      SELECT doc_id, COUNT(*) AS n_tokens,
        SUM(lp) / COUNT(*) AS avg_logprob
      FROM scored GROUP BY 1 ORDER BY doc_id""",

    "tx17_char_entropy" -> s"""
      WITH docs AS (
        SELECT doc_id, lower(trim(text)) AS t FROM documents
        WHERE length(lower(trim(text))) >= 3
      ), grams AS (
        SELECT doc_id, substr(t, i, 3) AS g FROM (
          SELECT doc_id, t,
            unnest(generate_series(1, length(t) - 2)) AS i
          FROM docs)
      ), cnt AS (
        SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY 1, 2
      ), tot AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
          COUNT(*) AS n_distinct
        FROM cnt GROUP BY 1
      )
      SELECT doc_id, MAX(n) AS n_grams, MAX(n_distinct) AS n_distinct,
        -SUM(round((c::DOUBLE / n::DOUBLE) * ln(c::DOUBLE / n::DOUBLE)
          * $LogGrid) / $LogGrid) AS entropy
      FROM cnt JOIN tot USING (doc_id)
      GROUP BY doc_id ORDER BY doc_id""",

    "tx10_repetition" -> raw"""
      WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        FROM documents
      ), g AS (
        SELECT doc_id,
          len(list_distinct(list_transform(
            generate_series(1, greatest(len(t) - 2, 1)),
            i -> array_to_string(list_slice(t, i, i + 2), ' '))))
            AS distinct_3grams,
          greatest(len(t) - 2, 1) AS total_3grams
        FROM toks
      )
      SELECT doc_id, distinct_3grams, total_3grams,
        1.0 - distinct_3grams::DOUBLE / total_3grams AS dup_frac
      FROM g ORDER BY doc_id""",

    "cur4_pipeline" -> s"""
      ${DedupQueries.candCte}, ${TextQueries.scoresCte.replaceFirst(
        raw"\s*WITH\s+", "")}, pred AS (
        SELECT doc_id, ${TextQueries.langCaseSql} AS lang_pred FROM scores
      ), feat AS (
        SELECT d.doc_id, d.lang, p.lang_pred,
          ${TextQueries.NT} AS n_tokens,
          0.4 * least(${TextQueries.NT}::DOUBLE / 100.0, 1.0)
            + 0.3 * (${TextQueries.ttrSql})
            + 0.3 * (1.0 - ${TextQueries.stopRatioSql}) AS quality
        FROM documents d JOIN pred p USING (doc_id)
      ), curated AS (
        SELECT doc_id, n_tokens FROM feat
        WHERE quality >= 0.6 AND n_tokens BETWEEN 20 AND 2000
          AND lang_pred = lang
      ), exact_keep AS (
        SELECT min(doc_id) AS doc_id FROM documents
        GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
      ), near_drops AS (
        SELECT DISTINCT id_b AS doc_id FROM (${DedupQueries.jaccardPairsSql})
        WHERE jaccard >= ${DedupQueries.JaccardTau}
      ), eb AS (
        SELECT vec_id, embedding, ${SimQueries.bucketSql("embedding")} AS bucket
        FROM embeddings
      ), sem_drops AS (
        SELECT DISTINCT id_b AS doc_id FROM (
          SELECT a.vec_id AS id_a, e.vec_id AS id_b,
            ${SimQueries.cosSql("a.embedding", "e.embedding")} AS cos
          FROM eb a JOIN eb e ON a.bucket = e.bucket AND a.vec_id < e.vec_id
        ) WHERE cos >= ${SimQueries.NearDupTau}
      ), keep AS (
        SELECT c.doc_id, c.n_tokens FROM curated c
        WHERE c.doc_id IN (SELECT doc_id FROM exact_keep)
          AND c.doc_id NOT IN (SELECT doc_id FROM near_drops)
          AND c.doc_id NOT IN (SELECT doc_id FROM sem_drops)
      ), run AS (
        SELECT doc_id, n_tokens,
          CAST(SUM(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
            AS BIGINT) AS start_offset
        FROM keep
      )
      SELECT doc_id, n_tokens, start_offset,
        start_offset // $PackBudget AS pack_id
      FROM run ORDER BY doc_id"""
  )
}
