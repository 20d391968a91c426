package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions._

/** Text-analysis queries over the `documents` table: token counting
  * (whitespace + BPE-ish pre-tokenizer), quality scoring, n-gram language-ID,
  * and document fingerprinting — every Spark expression has an exact DuckDB
  * twin built from the same constants below.
  *
  * All queries are narrow projections (+ one grouped agg) — they fuse into
  * one codegen stage over the parquet scan; nothing shuffles except tx5's
  * count aggregation.
  */
object TextQueries {

  /** DuckDB token-array expression — mirror of [[TextFunctions.tokens]]. */
  private val T = raw"regexp_split_to_array(trim(lower(text)), '\s+')"
  private[ops] val NT = raw"len($T)"

  /** Count-min sketch geometry (tx14): depth (independent hash rows) ×
    * width (counters per row). ε ≈ e/width, δ ≈ e^-depth.
    */
  private val CmsDepth = 4
  private val CmsWidth = 1024L
  private val CmsRowsSql = (0 until CmsDepth).mkString("[", ", ", "]")
  private val stopList = Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  /** tx31's term list: vocab words, phrases, and nested substrings
    * ("merge" inside "merge batch") — all border-free (enforced at
    * automaton build).
    */
  private[ops] val AcBlocklist: Seq[String] = Seq(
    "slow", "fast", "merge", "batch", "merge batch", "big vector",
    "vector", "spark", "table", "scan", "join", "small", "filter",
    "query", "column", "customer", "order", "group", "value part",
    "row", "line", "data", "key", "agg")

  private def occSql(sub: String): String =
    s"(length(lower(text)) - length(replace(lower(text), '$sub', ''))) / ${sub.length}"

  private def langScoreSql(markers: Seq[String]): String =
    markers.map(occSql).mkString("(", " + ", s") / length(text)")

  /** Cascading argmax CASE — mirror of [[TextFunctions.langId]]. */
  private[ops] val langCaseSql: String = {
    val scores = LangMarkers.map { case (l, ms) => l -> s"s_$l" }
    val branches = scores.init.zipWithIndex.map { case ((lang, s), i) =>
      val cond = scores.drop(i + 1).map(o => s"$s >= ${o._2}").mkString(" AND ")
      s"WHEN $cond THEN '$lang'"
    }
    s"CASE ${branches.mkString(" ")} ELSE '${scores.last._1}' END"
  }

  private[ops] val scoresCte: String = {
    val cols = LangMarkers.map { case (l, ms) =>
      s"${langScoreSql(ms)} AS s_$l"
    }.mkString(",\n        ")
    s"WITH scores AS (\n      SELECT doc_id, $cols\n      FROM documents\n    )"
  }

  private[ops] val stopRatioSql =
    s"len(list_filter($T, w -> list_contains($stopList, w)))::DOUBLE / $NT"
  private[ops] val ttrSql = s"len(array_distinct($T))::DOUBLE / $NT"

  /** DuckDB twin of [[graft.text.TextFunctions.qualityScore]]. */
  private[ops] val qualitySql =
    s"""0.4 * least($NT::DOUBLE / 100.0, 1.0)
          + 0.3 * ($ttrSql)
          + 0.3 * (1.0 - $stopRatioSql)"""

  /** Suffix-stripping stem of token expression `t` — ONE template string
    * rendered into both the Spark plan (expr) and the DuckDB oracle, so
    * the rule set cannot drift between engines. Ordered longest-suffix-
    * first with minimum-stem-length guards (the Porter S1 flavor).
    */
  private[ops] def stemCaseSql(t: String): String = s"""
    CASE WHEN $t LIKE '%edly' AND length($t) > 6
           THEN substr($t, 1, length($t) - 4)
         WHEN $t LIKE '%ness' AND length($t) > 6
           THEN substr($t, 1, length($t) - 4)
         WHEN $t LIKE '%ment' AND length($t) > 6
           THEN substr($t, 1, length($t) - 4)
         WHEN $t LIKE '%ing' AND length($t) > 5
           THEN substr($t, 1, length($t) - 3)
         WHEN $t LIKE '%ed' AND length($t) > 4
           THEN substr($t, 1, length($t) - 2)
         WHEN $t LIKE '%ly' AND length($t) > 4
           THEN substr($t, 1, length($t) - 2)
         WHEN $t LIKE '%es' AND length($t) > 4
           THEN substr($t, 1, length($t) - 2)
         WHEN $t LIKE '%s' AND $t NOT LIKE '%ss' AND length($t) > 3
           THEN substr($t, 1, length($t) - 1)
         ELSE $t END"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // BLOCKLIST SCREEN: per-source occurrence counts and flagged-doc
    // totals for a fixed phrase blocklist — the policy-filter primitive
    // every curation pipeline runs (spam/unsafe-term screens). Counting
    // is the subtraction-of-replace identity (non-overlapping occurrence
    // count, identical semantics in both engines), fully scan-side and
    // codegen'd; the only exchange is the per-source hash agg. A
    // thousand-term blocklist would move to one Aho-Corasick kernel
    // Expression (single pass per doc, BpeApply-style reference-object
    // automaton) — the per-term replace chain is the right shape only
    // for a bounded in-plan list like this one.
    "tx30_blocklist" -> ((s, dir) => {
      def h(t: String) = expr(
        s"(length(text) - length(replace(text, '$t', ''))) div ${t.length}")
      Tables(s, dir, "documents")
        .select(col("source"), h("slow").as("h1"),
          h("merge batch").as("h2"), h("big vector").as("h3"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("h1")).as("hits_slow"),
          sum(col("h2")).as("hits_merge_batch"),
          sum(col("h3")).as("hits_big_vector"),
          sum(((col("h1") + col("h2") + col("h3")) > 0).cast("long"))
            .as("n_flagged"))
        .orderBy(col("source"))
    }),

    // AHO–CORASICK blocklist at the shape tx30 documents as its scale
    // path: ONE automaton pass per document counts every term of a
    // 24-term list (words AND phrases, nested substrings included) —
    // O(doc_len) per doc regardless of list size, vs the per-term
    // replace chain's O(terms · doc_len). Per (source, term) hit mass;
    // the oracle recomputes each term's count with the replace identity
    // (exactly equal because the automaton builder REJECTS bordered
    // terms — see AcAutomaton).
    "tx31_blocklist_ac" -> ((s, dir) => {
      val terms = AcBlocklist
      Tables(s, dir, "documents")
        .select(col("source"),
          graft.functions.AcCount(col("text"), terms).as("c"))
        .select(col("source"), posexplode(col("c")).as(Seq("i", "hits")))
        .select(col("source"),
          element_at(typedlit(terms), col("i") + 1).as("term"),
          col("hits"))
        .groupBy(col("source"), col("term"))
        .agg(sum(col("hits")).as("hits"))
        .orderBy(col("source"), col("term"))
    }),

    // OOV RATE per source against a trained top-K vocabulary — the
    // tokenizer-coverage instrument behind vocab sizing: corpus token
    // frequencies → top-16 vocab (TakeOrdered, count-desc/token-asc
    // total order) → broadcast anti-probe of the token stream → per-
    // source out-of-vocabulary mass in exact ppm. One explode + two
    // hash aggs + a broadcast join; nothing corpus-wide ever sorts.
    "tx32_oov_rate" -> ((s, dir) => {
      val tok = Tables(s, dir, "documents")
        .select(col("source"), explode(tokens(col("text"))).as("t"))
      val vocab = tok.groupBy(col("t")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("t")).limit(16)
        .select(col("t"), lit(1L).as("__in"))
      tok.join(broadcast(vocab), Seq("t"), "left_outer")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_ppm", expr("n_oov * 1000000 div n_tokens"))
        .orderBy(col("source"))
    }),

    // SUFFIX-STRIPPING STEMMER (Porter-S1-flavor rules, longest suffix
    // first with stem-length guards) — the vocabulary-conflation
    // primitive under search/TF-IDF recall. The rule CASE is one shared
    // template rendered into BOTH engines, so rules can't drift. Output:
    // the 20 heaviest stems with occurrence mass and how many distinct
    // raw token forms each conflates. Scan-side map + one hash agg.
    "tx27_stem" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(explode(tokens(col("text"))).as("tok"))
        .select(expr(stemCaseSql("tok")).as("stem"), col("tok"))
        .groupBy(col("stem"))
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct(col("tok")).as("n_variants"))
        .orderBy(col("n_occurrences").desc, col("stem"))
        .limit(20)),

    // TOKENIZER COMPRESSION report per source domain — the
    // cost-of-serving instrument for the tokenizer stack (tx19/tx20):
    // characters per pre-tokenized piece and pieces per whitespace word
    // in exact ppm, aggregated from per-doc integer counts. A domain
    // whose chars/piece collapses toward 1 is code/noise the byte-level
    // pieces will bloat; training-budget math runs on exactly these
    // ratios. One scan-side projection + one hash agg by source.
    "tx28_token_compression" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(col("source"),
          length(regexp_replace(col("text"), "\\s+", "")).cast("long")
            .as("n_chars_nospace"),
          tokenCount(col("text")).cast("long").as("n_tokens"),
          bpeTokenCount(col("text")).cast("long").as("n_pieces"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars_nospace")).as("chars"),
          sum(col("n_tokens")).as("tokens"),
          sum(col("n_pieces")).as("pieces"))
        .select(col("source"), col("n_docs"), col("chars"), col("tokens"),
          col("pieces"),
          expr("chars * 1000000 div pieces").as("chars_per_piece_ppm"),
          expr("pieces * 1000000 div tokens").as("pieces_per_token_ppm"))
        .orderBy(col("source"))),

    // READABILITY (Flesch reading-ease) per source domain — the
    // education-level quality signal filters cut on. Words, sentences
    // and a vowel-group syllable proxy are exact integer counts summed
    // per source; the score is ONE fixed IEEE chain on the aggregate
    // ratios (constants + two divisions — no libm), so both engines
    // land on identical doubles. Per-doc floats never accumulate.
    "tx29_readability" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(col("source"),
          tokenCount(col("text")).cast("long").as("w"),
          greatest(size(expr(
            raw"regexp_extract_all(text, '[.!?]+', 0)")).cast("long"),
            lit(1L)).as("sent"),
          size(expr(
            raw"regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
            .cast("long").as("syll"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("words"),
          sum(col("sent")).as("sentences"),
          sum(col("syll")).as("syllables"))
        .withColumn("flesch",
          lit(206.835) -
            lit(1.015) * (col("words").cast("double") /
              col("sentences").cast("double")) -
            lit(84.6) * (col("syllables").cast("double") /
              col("words").cast("double")))
        .orderBy(col("source"))),

    // PMI COLLOCATIONS — pointwise mutual information of consecutive token
    // pairs, the classic multi-word-expression detector (and a corpus-
    // health signal: templated corpora surface machine boilerplate at the
    // top). pmi = ln p(ab) − ln p(a) − ln p(b) over the bigram/unigram
    // tables; every ln lands on the 2^-20 grid as a scaled BIGINT first,
    // so the five-term sum is exact integer arithmetic and the reported
    // double is one exact power-of-two division (the tx9/tx25
    // discipline). min-count 10 guards the low-count PMI explosion. Scale
    // shape: two vocab-bounded hash aggs + joins keyed on tokens (AQE
    // broadcasts them at fixture scale, shuffle joins at corpus scale —
    // deliberately unhinted, the tx16 note), TakeOrdered top-100.
    "tx26_pmi" -> ((s, dir) => {
      val g = 1048576L
      def lng(c: org.apache.spark.sql.Column) =
        round(log(c.cast("double")) * g).cast("long")
      val tok = Tables(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .select(posexplode(col("t")).as(Seq("pos", "w")), col("t"))
        .withColumn("prev",
          when(col("pos") > 0, element_at(col("t"), col("pos"))))
        .select(col("prev"), col("w"))
      val uni = tok.groupBy(col("w")).agg(count(lit(1)).as("c1"))
      val nu = uni.agg(sum(col("c1")).as("nu"))
      val bi = tok.filter(col("prev").isNotNull)
        .groupBy(col("prev").as("w1"), col("w").as("w2"))
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 10)
      val nb = tok.filter(col("prev").isNotNull)
        .agg(count(lit(1)).as("nb"))
      bi.join(uni.select(col("w").as("w1"), col("c1").as("na")), "w1")
        .join(uni.select(col("w").as("w2"), col("c1").as("nc")), "w2")
        .crossJoin(broadcast(nu))
        .crossJoin(broadcast(nb))
        .select(col("w1"), col("w2"), col("n_ab"),
          ((lng(col("n_ab")) - lng(col("nb")) - lng(col("na")) -
            lng(col("nc")) + lit(2) * lng(col("nu"))).cast("double") /
            lit(g.toDouble)).as("pmi"))
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(100)
    }),

    // G² KEYNESS (Dunning log-likelihood, "Accurate methods for the
    // statistics of surprise and coincidence", CL 19(1) 1993): which
    // words are over/under-represented in the English subcorpus vs the
    // rest — the corpus-comparison primitive behind domain-signature
    // analysis and contamination triage. The 2×2 G² expands into pure
    // ln-of-integer terms, G² = 2·[a(ln a − ln c) + b(ln b − ln d) +
    // (a+b)(ln N − ln(a+b))]; each ln is quantized to the 2^-20 grid
    // (the tx26 discipline) so the score is EXACT integer arithmetic —
    // emitted in grid units (BIGINT), no double ever formed, safe at any
    // corpus size. 0·ln 0 = 0 by convention (the CASE guards).
    "tx34_g2_keyness" -> ((s, dir) => {
      val g = 1048576L
      def lng(c: org.apache.spark.sql.Column) =
        round(log(c.cast("double")) * g).cast("long")
      val tok = Tables(s, dir, "documents")
        .select(col("lang"), explode(tokens(col("text"))).as("w"))
      def inEn(one: Long, other: Long) =
        when(col("lang") === "en", lit(one)).otherwise(lit(other))
      val counts = tok.groupBy(col("w"))
        .agg(sum(inEn(1L, 0L)).as("a"), sum(inEn(0L, 1L)).as("b"))
        .filter(col("a") + col("b") >= 20)
      val sizes = tok.agg(
        sum(inEn(1L, 0L)).as("c"), sum(inEn(0L, 1L)).as("d"))
      counts.crossJoin(broadcast(sizes))
        .select(col("w"), col("a"), col("b"),
          (lit(2L) * (
            when(col("a") > 0,
              col("a") * (lng(col("a")) - lng(col("c")))).otherwise(0L) +
            when(col("b") > 0,
              col("b") * (lng(col("b")) - lng(col("d")))).otherwise(0L) +
            (col("a") + col("b")) *
              (lng(col("c") + col("d")) - lng(col("a") + col("b")))))
            .as("g2_grid"))
        .orderBy(col("g2_grid").desc, col("w"))
        .limit(50)
    }),

    // GOOD-TURING smoothed counts (Good 1953; the frequency-of-
    // frequencies estimator under Katz backoff): for each observed count
    // r, N_r = how many word types occur exactly r times, and the
    // smoothed count r* = (r+1)·N_{r+1}/N_r — the probability mass
    // reassigned toward unseen events. Two hash aggregations (counts,
    // then counts-of-counts) + a 1-row-per-r self-join on r+1; r* is ONE
    // IEEE division of exact integers — bit-identical cross-engine with
    // no grid. Rows with no N_{r+1} (the tail) report NULL r*, as the
    // estimator is undefined there.
    "tx36_good_turing" -> ((s, dir) => {
      val counts = Tables(s, dir, "documents")
        .select(explode(tokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("r"))
      val nr = counts.groupBy(col("r")).agg(count(lit(1)).as("n_r"))
      nr.join(nr.select((col("r") - 1).as("r"), col("n_r").as("n_r1")),
          Seq("r"), "left")
        .select(col("r"), col("n_r"),
          ((col("r") + 1).cast("double") * col("n_r1").cast("double") /
            col("n_r").cast("double")).as("r_star"))
        .orderBy(col("r"))
    }),

    // WORD BURSTINESS (Church & Gale 1995): the variance-to-mean ratio of
    // a word's per-document count — content words burst (VMR >> 1),
    // function words scatter Poisson-like (VMR ≈ 1); the signal behind
    // adaptive LM caching and topicality weighting. Absent docs count as
    // zero, so with D docs, Σx and Σx² over PRESENT docs suffice:
    // VMR = (D·Σx² − (Σx)²) / (D·Σx) — exact DECIMAL(38,0) integers,
    // reported in ppm fixed-point via IntegralDivide (no double sums, no
    // grid). Two hash aggregations; candidate set capped at Σx ≥ 100.
    "tx37_burstiness" -> ((s, dir) => {
      val Dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val docs = Tables(s, dir, "documents")
      val perDoc = docs
        .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
        .groupBy(col("w"), col("doc_id"))
        .agg(count(lit(1)).as("x"))
      val d = docs.agg(count(lit(1)).cast(Dec).as("d"))
      perDoc.groupBy(col("w"))
        .agg(sum(col("x").cast(Dec)).as("sx"),
          sum((col("x") * col("x")).cast(Dec)).as("sxx"),
          count(lit(1)).as("n_docs_present"))
        .filter(col("sx") >= 100)
        .crossJoin(broadcast(d))
        .select(col("w"), col("sx").cast("long").as("total_count"),
          col("n_docs_present"),
          expr("(d * sxx - sx * sx) * 1000000 div (d * sx)")
            .as("vmr_ppm"))
        .orderBy(col("vmr_ppm").desc, col("w"))
        .limit(50)
    }),

    "tx1_token_stats" -> ((s, dir) =>
      Tables(s, dir, "documents").select(
          col("doc_id"),
          tokenCount(col("text")).as("n_tokens"),
          bpeTokenCount(col("text")).as("n_pieces"),
          meanTokenLen(col("text")).as("mean_token_len"))
        .orderBy(col("doc_id"))),

    "tx2_quality" -> ((s, dir) =>
      Tables(s, dir, "documents").select(
          col("doc_id"),
          typeTokenRatio(col("text")).as("ttr"),
          stopwordRatio(col("text")).as("stop_ratio"),
          qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))),

    "tx3_langid" -> ((s, dir) =>
      Tables(s, dir, "documents").select(
          col("doc_id"),
          langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))),

    // Sketch = min hash60 over char 8-grams — one native loop per row
    // (graft.functions.MinCharGramHashExpr), so the whole query is a narrow
    // codegen'd projection; norm is projected once and shared by fp+sketch.
    "tx4_fingerprint" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), normalizeText(col("text")).as("nt"))
        .select(col("doc_id"), md5(col("nt").cast("binary")).as("fp"),
          graft.functions.Hash60.minGram(col("nt"), 8).as("sketch"))
        .orderBy(col("doc_id"))),

    // Grouped agg over a derived (computed) key.
    "tx5_lang_counts" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .groupBy(langId(col("text")).as("lang_pred"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("lang_pred"))),

    // The composed pretraining-curation pass: keep documents whose
    // heuristic language-ID agrees with the label, whose quality score
    // clears a bar, and whose token count is in range — the
    // filter-the-corpus step every training-data pipeline runs before
    // dedup. One narrow codegen'd projection + filter; at lake scale this
    // is a single scan with every predicate evaluated scan-side.
    "cur1_curation" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          langId(col("text")).as("lang_pred"),
          tokenCount(col("text")).as("n_tokens"),
          qualityScore(col("text")).as("quality"))
        .filter(col("quality") >= 0.6 &&
          col("n_tokens").between(20, 2000) &&
          col("lang_pred") === col("lang"))
        .orderBy(col("doc_id"))),

    // Language-ID evaluation: the (label, prediction) confusion matrix —
    // the accuracy readout any heuristic classifier pass ships with. One
    // hash agg over O(langs²) cells.
    "tx12_lang_confusion" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .groupBy(col("lang"), langId(col("text")).as("lang_pred"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("lang"), col("lang_pred"))),

    // EXACT heavy hitters without a full-vocabulary shuffle: per-partition
    // Misra-Gries candidate summaries + broadcast exact verify — output
    // provably equals the naive GROUP BY ... HAVING (threshold above the
    // n/capacity guarantee), which is exactly what the oracle computes.
    "tx13_heavy_hitters" -> ((s, dir) =>
      graft.text.HeavyHitters.frequentTokens(
          Tables(s, dir, "documents"), "text", threshold = 150)
        .orderBy(col("tok"))),

    // Relational COUNT-MIN SKETCH: the point-query frequency companion to
    // q39's mergeable HLL. The sketch IS a (depth × width) counter table —
    // 4 salted Hash60 rows of 1024 buckets — built by one map-side-
    // combinable hash agg over the token stream; its size is fixed at any
    // corpus scale, and two sketches merge by summing counters (per shard,
    // per day, per stream micro-batch). Point estimate = MIN over the
    // depth rows' counters, guaranteed ≥ the true count; the gate reports
    // estimate vs exact for every vocab word so the oracle checks the
    // whole estimator, not just the bound.
    "tx14_cms_sketch" -> ((s, dir) => {
      val toks = Tables(s, dir, "documents")
        .select(explode(tokens(col("text"))).as("w"))
      def rb(wCol: org.apache.spark.sql.Column) =
        explode(array((0 until CmsDepth).map(i =>
          struct(lit(i).as("r"),
            (graft.functions.Hash60(concat(lit(s"cms$i:"), wCol))
              % CmsWidth).as("b"))): _*))
      val ex = toks.select(rb(col("w")).as("rb"))
        .select(col("rb.r").as("r"), col("rb.b").as("b"))
      val sketch = ex.groupBy(col("r"), col("b"))
        .agg(count(lit(1)).as("cnt"))
      val exact = toks.groupBy(col("w")).agg(count(lit(1)).as("exact_cnt"))
      exact.select(col("w"), col("exact_cnt"), rb(col("w")).as("rb"))
        .select(col("w"), col("exact_cnt"),
          col("rb.r").as("r"), col("rb.b").as("b"))
        .join(broadcast(sketch), Seq("r", "b"))
        .groupBy(col("w"), col("exact_cnt"))
        .agg(min(col("cnt")).as("cms_est"))
        .select(col("w").as("word"), col("exact_cnt"), col("cms_est"),
          (col("cms_est") - col("exact_cnt")).as("overcount"))
        .orderBy(col("word"))
    }),

    // URL canonicalization + dedup-by-URL — the crawl-pipeline step that
    // runs before any content dedup (WARC processing collapses refetches
    // of the same page under tracking-parameter noise). The corpus carries
    // no URLs, so a deterministic raw URL is derived per doc exactly like
    // tx11 derives PII: mixed-case host from the source domain, a path,
    // rotating utm/session tracking params, an optional #fragment.
    // Canonicalize = lowercase scheme+host, strip utm_*/session params,
    // drop the fragment, drop a trailing slash. Pure scan-side regex
    // surgery (codegen'd), then one hash agg on the canonical key.
    "tx15_url_normalize" -> ((s, dir) => {
      val raw = concat(
        lit("https://WWW."), upper(substring(col("source"), 1, 1)),
        substring(col("source"), 2, 100), lit(".example.com/docs/"),
        pmod(col("doc_id"), lit(50)).cast("string"),
        lit("?utm_source=feed&id="), pmod(col("doc_id"), lit(25)).cast("string"),
        lit("&session="), col("doc_id").cast("string"),
        lit("#sec"), pmod(col("doc_id"), lit(7)).cast("string"))
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), raw.as("raw_url"))
        .withColumn("no_frag", regexp_replace(col("raw_url"), lit("#.*$"), lit("")))
        .withColumn("clean_q", regexp_replace(col("no_frag"),
          lit("(?:utm_[A-Za-z]+|session)=[^&#]*&?"), lit("")))
        .withColumn("tidy", regexp_replace(col("clean_q"), lit("[?&]$"), lit("")))
        .withColumn("canon_url", concat(
          lower(regexp_extract(col("tidy"), "^https?://[^/]+", 0)),
          regexp_replace(regexp_extract(col("tidy"), "^https?://[^/]+(.*)$", 1),
            lit("/$"), lit(""))))
        .groupBy(col("source"), col("canon_url"))
        .agg(count(lit(1)).as("n_fetches"),
          min(col("doc_id")).as("keep_doc"))
        .orderBy(col("source"), col("canon_url"))
    }),

    // PII scrubbing — the redaction pass a training-data pipeline runs
    // before anything ships. The synthetic corpus carries no PII, so a
    // deterministic contact line (email + phone derived from doc_id) is
    // appended identically on both engines; the gate then verifies the
    // REGEX path cross-engine (Java regex vs DuckDB RE2 — patterns are
    // restricted to the shared dialect) via match counts and an md5 of the
    // fully redacted text. Narrow scan-side projection; no shuffle.
    "tx11_pii_redact" -> ((s, dir) => {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "\\+1-555-[0-9]{4}"
      Tables(s, dir, "documents")
        .select(col("doc_id"), concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com or +1-555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
          .as("aug"))
        .select(col("doc_id"),
          regexp_count(col("aug"), lit(email)).cast("bigint").as("n_emails"),
          regexp_count(col("aug"), lit(phone)).cast("bigint").as("n_phones"),
          md5(regexp_replace(regexp_replace(col("aug"), lit(email),
            lit("<EMAIL>")), lit(phone), lit("<PHONE>")).cast("binary"))
            .as("redacted_md5"),
          length(col("aug")).cast("bigint").as("n_chars_in"))
        .orderBy(col("doc_id"))
    }),

    // RAKE keyword extraction (Rose et al. 2010): stopwords delimit
    // candidate phrases; a word scores deg/freq where deg sums the length
    // of every phrase occurrence containing it; a phrase scores the sum
    // of its member word scores (with multiplicity). The division is
    // floor-quantized to integer micro-units on both engines so the
    // rational word scores stay bit-exact. Scale shape: phrase splitting
    // is scan-side array algebra (no join, no window); then two hash aggs
    // (word stats, phrase occurrence counts) and one equi-join on word —
    // every exchange keyed, corpus never all-pairs.
    "tx24_rake_keywords" -> ((s, dir) => {
      val stop = array(graft.text.TextFunctions.Stopwords.map(lit): _*)
      val toks = split(lower(trim(col("text"))), "\\s+")
      val marked = transform(toks, w =>
        when(array_contains(stop, w), lit("|")).otherwise(w))
      val phr = filter(transform(split(array_join(marked, " "), "\\|"),
        p => trim(p)), p => p =!= "")
      val occ = Tables(s, dir, "documents")
        .select(explode(phr).as("phrase"))
      val words = occ.select(col("phrase"),
          size(split(col("phrase"), " ")).cast("long").as("len"))
        .select(col("len"), explode(split(col("phrase"), " ")).as("w"))
      val wstats = words.groupBy(col("w"))
        .agg(sum(col("len")).as("deg"), count(lit(1)).as("freq"))
        .select(col("w"), expr("deg * 1000000 div freq").as("wscore"))
      val pd = occ.groupBy(col("phrase")).agg(count(lit(1)).as("n_occ"))
      pd.select(col("phrase"), col("n_occ"),
          explode(split(col("phrase"), " ")).as("w"))
        .join(wstats, "w")
        .groupBy(col("phrase"), col("n_occ"))
        .agg(sum(col("wscore")).as("score_micro"))
        .orderBy(col("score_micro").desc, col("phrase"))
        .limit(50)
        .select(col("phrase"), col("n_occ"), col("score_micro"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "tx32_oov_rate" -> s"""
      WITH tok AS (
        SELECT source, unnest($T) AS t FROM documents
      ), vocab AS (
        SELECT t FROM (
          SELECT t, COUNT(*) AS c FROM tok GROUP BY t
          ORDER BY c DESC, t LIMIT 16)
      ), j AS (
        SELECT source,
          CASE WHEN v.t IS NULL THEN 1 ELSE 0 END AS oov
        FROM tok LEFT JOIN vocab v USING (t)
      )
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        CAST(SUM(oov) AS BIGINT) AS n_oov,
        CAST(SUM(oov) AS BIGINT) * 1000000 // COUNT(*) AS oov_ppm
      FROM j GROUP BY source ORDER BY source""",

    "tx31_blocklist_ac" -> s"""
      WITH t(term) AS (VALUES ${AcBlocklist
        .map(t => s"('$t')").mkString(", ")}),
      h AS (
        SELECT source, term,
          (length(text) - length(replace(text, term, ''))) // length(term)
            AS hits
        FROM documents CROSS JOIN t
      )
      SELECT source, term, CAST(SUM(hits) AS BIGINT) AS hits
      FROM h GROUP BY source, term ORDER BY source, term""",

    "tx30_blocklist" -> """
      WITH h AS (
        SELECT source,
          (length(text) - length(replace(text, 'slow', ''))) // 4 AS h1,
          (length(text) - length(replace(text, 'merge batch', ''))) // 11
            AS h2,
          (length(text) - length(replace(text, 'big vector', ''))) // 10
            AS h3
        FROM documents
      )
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(h1) AS BIGINT) AS hits_slow,
        CAST(SUM(h2) AS BIGINT) AS hits_merge_batch,
        CAST(SUM(h3) AS BIGINT) AS hits_big_vector,
        CAST(SUM(CASE WHEN h1 + h2 + h3 > 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_flagged
      FROM h GROUP BY source ORDER BY source""",

    "tx29_readability" -> raw"""
      WITH per_doc AS (
        SELECT source, CAST($NT AS BIGINT) AS w,
          greatest(CAST(len(regexp_extract_all(text, '[.!?]+'))
            AS BIGINT), 1) AS sent,
          CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
            AS BIGINT) AS syll
        FROM documents
      )
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(w) AS BIGINT) AS words,
        CAST(SUM(sent) AS BIGINT) AS sentences,
        CAST(SUM(syll) AS BIGINT) AS syllables,
        206.835
          - 1.015 * (CAST(SUM(w) AS BIGINT)::DOUBLE
            / CAST(SUM(sent) AS BIGINT)::DOUBLE)
          - 84.6 * (CAST(SUM(syll) AS BIGINT)::DOUBLE
            / CAST(SUM(w) AS BIGINT)::DOUBLE) AS flesch
      FROM per_doc GROUP BY source ORDER BY source""",

    "tx28_token_compression" -> raw"""
      WITH per_doc AS (
        SELECT source,
          CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT)
            AS n_chars_nospace,
          CAST($NT AS BIGINT) AS n_tokens,
          CAST(len(regexp_extract_all(text,
            '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_pieces
        FROM documents
      )
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_chars_nospace) AS BIGINT) AS chars,
        CAST(SUM(n_tokens) AS BIGINT) AS tokens,
        CAST(SUM(n_pieces) AS BIGINT) AS pieces,
        CAST(CAST(SUM(n_chars_nospace) AS BIGINT) * 1000000
          // CAST(SUM(n_pieces) AS BIGINT) AS BIGINT)
          AS chars_per_piece_ppm,
        CAST(CAST(SUM(n_pieces) AS BIGINT) * 1000000
          // CAST(SUM(n_tokens) AS BIGINT) AS BIGINT)
          AS pieces_per_token_ppm
      FROM per_doc GROUP BY source ORDER BY source""",

    "tx27_stem" -> raw"""
      WITH toks AS (
        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        FROM documents
      )
      SELECT (${stemCaseSql("tok")}) AS stem,
        CAST(COUNT(*) AS BIGINT) AS n_occurrences,
        CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_variants
      FROM toks GROUP BY 1
      ORDER BY n_occurrences DESC, stem LIMIT 20""",

    "tx26_pmi" -> raw"""
      WITH docs AS (
        SELECT doc_id, $T AS t FROM documents
      ), pos AS (
        SELECT doc_id, unnest(generate_series(1, len(t))) AS i, t FROM docs
      ), tok AS (
        SELECT CASE WHEN i > 1 THEN t[i - 1] ELSE NULL END AS prev,
          t[i] AS w
        FROM pos
      ), uni AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS c1 FROM tok GROUP BY 1
      ), nu AS (SELECT CAST(SUM(c1) AS BIGINT) AS nu FROM uni),
      nb AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS nb FROM tok
        WHERE prev IS NOT NULL
      ), bi AS (
        SELECT prev AS w1, w AS w2, CAST(COUNT(*) AS BIGINT) AS n_ab
        FROM tok WHERE prev IS NOT NULL
        GROUP BY 1, 2 HAVING COUNT(*) >= 10
      )
      SELECT w1, w2, n_ab,
        CAST(CAST(round(ln(n_ab::DOUBLE) * 1048576) AS BIGINT)
          - CAST(round(ln(nb::DOUBLE) * 1048576) AS BIGINT)
          - CAST(round(ln(ua.c1::DOUBLE) * 1048576) AS BIGINT)
          - CAST(round(ln(uc.c1::DOUBLE) * 1048576) AS BIGINT)
          + 2 * CAST(round(ln(nu::DOUBLE) * 1048576) AS BIGINT) AS DOUBLE)
          / 1048576.0 AS pmi
      FROM bi
      JOIN uni ua ON ua.w = w1
      JOIN uni uc ON uc.w = w2, nu, nb
      ORDER BY pmi DESC, w1, w2 LIMIT 100""",

    "tx37_burstiness" -> raw"""
      WITH perdoc AS (
        SELECT w, doc_id, CAST(COUNT(*) AS HUGEINT) AS x FROM (
          SELECT doc_id,
            unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
          FROM documents) GROUP BY w, doc_id
      ), d AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS d FROM documents
      ), agg AS (
        SELECT w, SUM(x) AS sx, SUM(x * x) AS sxx,
          CAST(COUNT(*) AS BIGINT) AS n_docs_present
        FROM perdoc GROUP BY w HAVING SUM(x) >= 100
      )
      SELECT w, CAST(sx AS BIGINT) AS total_count, n_docs_present,
        CAST((d * sxx - sx * sx) * 1000000 // (d * sx) AS BIGINT)
          AS vmr_ppm
      FROM agg, d
      ORDER BY vmr_ppm DESC, w LIMIT 50""",

    "tx36_good_turing" -> raw"""
      WITH counts AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS r FROM (
          SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
            AS w
          FROM documents) GROUP BY w
      ), nr AS (
        SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r FROM counts GROUP BY r
      )
      SELECT a.r, a.n_r,
        (a.r + 1)::DOUBLE * b.n_r::DOUBLE / a.n_r::DOUBLE AS r_star
      FROM nr a LEFT JOIN nr b ON b.r = a.r + 1
      ORDER BY a.r""",

    "tx34_g2_keyness" -> raw"""
      WITH tok AS (
        SELECT lang,
          unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
        FROM documents
      ), sizes AS (
        SELECT
          CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
            AS c,
          CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT)
            AS d
        FROM tok
      ), counts AS (
        SELECT w,
          CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
            AS a,
          CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT)
            AS b
        FROM tok GROUP BY w HAVING COUNT(*) >= 20
      )
      SELECT w, a, b,
        2 * (CASE WHEN a > 0 THEN
               a * (CAST(round(ln(a::DOUBLE) * 1048576) AS BIGINT)
                  - CAST(round(ln(c::DOUBLE) * 1048576) AS BIGINT))
             ELSE 0 END
           + CASE WHEN b > 0 THEN
               b * (CAST(round(ln(b::DOUBLE) * 1048576) AS BIGINT)
                  - CAST(round(ln(d::DOUBLE) * 1048576) AS BIGINT))
             ELSE 0 END
           + (a + b) *
               (CAST(round(ln((c + d)::DOUBLE) * 1048576) AS BIGINT)
              - CAST(round(ln((a + b)::DOUBLE) * 1048576) AS BIGINT)))
          AS g2_grid
      FROM counts, sizes
      ORDER BY g2_grid DESC, w LIMIT 50""",

    "tx12_lang_confusion" -> s"""
      $scoresCte
      SELECT d.lang, $langCaseSql AS lang_pred, COUNT(*) AS n_docs
      FROM scores JOIN documents d USING (doc_id)
      GROUP BY 1, 2 ORDER BY 1, 2""",

    "tx13_heavy_hitters" -> raw"""
      WITH toks AS (
        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        FROM documents
      )
      SELECT tok, COUNT(*) AS n_occurrences
      FROM toks GROUP BY tok HAVING COUNT(*) >= 150
      ORDER BY tok""",

    // Patterns restricted to the Java∩RE2 dialect (like tx11); DuckDB
    // regexp_replace needs the 'g' flag to match Java's replace-all.
    "tx15_url_normalize" -> raw"""
      WITH rawu AS (
        SELECT doc_id, source,
          'https://WWW.' || upper(substr(source, 1, 1))
            || substr(source, 2, 100)
            || '.example.com/docs/' || (doc_id % 50)::VARCHAR
            || '?utm_source=feed&id=' || (doc_id % 25)::VARCHAR
            || '&session=' || doc_id::VARCHAR
            || '#sec' || (doc_id % 7)::VARCHAR AS raw_url
        FROM documents
      ), t AS (
        SELECT doc_id, source,
          regexp_replace(regexp_replace(
            regexp_replace(raw_url, '#.*$$', '', 'g'),
            '(?:utm_[A-Za-z]+|session)=[^&#]*&?', '', 'g'),
            '[?&]$$', '', 'g') AS tidy
        FROM rawu
      ), c AS (
        SELECT doc_id, source,
          lower(regexp_extract(tidy, '^https?://[^/]+', 0)) ||
          regexp_replace(
            regexp_extract(tidy, '^https?://[^/]+(.*)$$', 1), '/$$', '', 'g')
            AS canon_url
        FROM t
      )
      SELECT source, canon_url, COUNT(*) AS n_fetches,
        MIN(doc_id) AS keep_doc
      FROM c GROUP BY 1, 2 ORDER BY 1, 2""",

    "tx14_cms_sketch" -> s"""
      WITH toks AS (
        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
        FROM documents
      ), ex AS (
        SELECT r, ('0x' || substr(md5('cms' || r::VARCHAR || ':' || w),
          1, 15))::BIGINT % $CmsWidth AS b
        FROM toks, (SELECT unnest($CmsRowsSql) AS r) rr
      ), sketch AS (
        SELECT r, b, COUNT(*) AS cnt FROM ex GROUP BY 1, 2
      ), exact AS (
        SELECT w, COUNT(*) AS exact_cnt FROM toks GROUP BY 1
      ), kb AS (
        SELECT e.w, e.exact_cnt, rr.r,
          ('0x' || substr(md5('cms' || rr.r::VARCHAR || ':' || e.w),
            1, 15))::BIGINT % $CmsWidth AS b
        FROM exact e, (SELECT unnest($CmsRowsSql) AS r) rr
      )
      SELECT k.w AS word, k.exact_cnt,
        MIN(s.cnt) AS cms_est, MIN(s.cnt) - k.exact_cnt AS overcount
      FROM kb k JOIN sketch s USING (r, b)
      GROUP BY 1, 2 ORDER BY 1""",

    "tx11_pii_redact" -> raw"""
      WITH aug AS (
        SELECT doc_id,
          text || ' contact user' || doc_id || '@example.com or +1-555-' ||
            lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS aug
        FROM documents
      )
      SELECT doc_id,
        len(regexp_extract_all(aug,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        len(regexp_extract_all(aug, '\+1-555-[0-9]{4}')) AS n_phones,
        md5(regexp_replace(regexp_replace(aug,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          '\+1-555-[0-9]{4}', '<PHONE>', 'g')) AS redacted_md5,
        strlen(aug) AS n_chars_in
      FROM aug ORDER BY doc_id""",

    "tx1_token_stats" -> raw"""
      SELECT doc_id,
        $NT AS n_tokens,
        len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_pieces,
        length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE / $NT AS mean_token_len
      FROM documents ORDER BY doc_id""",

    "tx2_quality" -> s"""
      SELECT doc_id,
        $ttrSql AS ttr,
        $stopRatioSql AS stop_ratio,
        $qualitySql AS quality
      FROM documents ORDER BY doc_id""",

    "tx3_langid" -> s"""
      $scoresCte
      SELECT doc_id, $langCaseSql AS lang_pred
      FROM scores ORDER BY doc_id""",

    "tx4_fingerprint" -> raw"""
      WITH norm AS (
        SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt
        FROM documents
      )
      SELECT doc_id, md5(nt) AS fp,
        list_min(list_transform(
          generate_series(1, greatest(length(nt) - 7, 1)),
          i -> ('0x' || substr(md5(substr(nt, i, 8)), 1, 15))::BIGINT)) AS sketch
      FROM norm ORDER BY doc_id""",

    "tx5_lang_counts" -> s"""
      $scoresCte
      SELECT $langCaseSql AS lang_pred, COUNT(*) AS n_docs
      FROM scores GROUP BY 1 ORDER BY lang_pred""",

    "cur1_curation" -> s"""
      $scoresCte, pred AS (
        SELECT doc_id, $langCaseSql AS lang_pred FROM scores
      ), feat AS (
        SELECT d.doc_id, d.lang, p.lang_pred,
          $NT AS n_tokens,
          0.4 * least($NT::DOUBLE / 100.0, 1.0)
            + 0.3 * ($ttrSql)
            + 0.3 * (1.0 - $stopRatioSql) AS quality
        FROM documents d JOIN pred p USING (doc_id)
      )
      SELECT doc_id, lang, lang_pred, n_tokens, quality FROM feat
      WHERE quality >= 0.6 AND n_tokens BETWEEN 20 AND 2000
        AND lang_pred = lang
      ORDER BY doc_id""",

    "tx24_rake_keywords" -> """
      WITH toks AS (
        SELECT string_split_regex(lower(trim(text)), '\s+') AS t
        FROM documents
      ), occ AS (
        SELECT trim(p) AS phrase FROM (
          SELECT UNNEST(string_split(array_to_string(
            list_transform(t, w -> CASE WHEN w IN
              ('the','a','an','of','to','and','in','is','it','on')
              THEN '|' ELSE w END), ' '), '|')) AS p
          FROM toks
        ) WHERE trim(p) <> ''
      ), words AS (
        SELECT CAST(len(string_split(phrase, ' ')) AS BIGINT) AS l,
          UNNEST(string_split(phrase, ' ')) AS w
        FROM occ
      ), wstats AS (
        SELECT w, CAST(SUM(l) AS BIGINT) * 1000000
          // CAST(COUNT(*) AS BIGINT) AS wscore
        FROM words GROUP BY 1
      ), pd AS (
        SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occ FROM occ GROUP BY 1
      ), pw AS (
        SELECT phrase, n_occ, UNNEST(string_split(phrase, ' ')) AS w FROM pd
      )
      SELECT pw.phrase AS phrase, pw.n_occ AS n_occ,
        CAST(SUM(ws.wscore) AS BIGINT) AS score_micro
      FROM pw JOIN wstats ws ON pw.w = ws.w
      GROUP BY 1, 2 ORDER BY score_micro DESC, phrase LIMIT 50"""
  )
}
