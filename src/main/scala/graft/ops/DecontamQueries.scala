package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hash60
import graft.text.WordNGrams

/** Benchmark decontamination and passage-level duplication — the two
  * cross-document n-gram checks every pretraining corpus runs before
  * training (the reference corpus side has no analogue; these extend the
  * LLM-pipeline surface alongside `dd*`/`tx*`).
  *
  * Both work on 8-token word shingles (the canonical 8-13-gram
  * decontamination window; 8 keeps the sf0.001 gate non-empty), tokenized
  * exactly like every other text operator in the library
  * (`split(lower(trim(text)), "\s+")`), via the native [[WordNGrams]]
  * kernels — one codegen pass per row, no interpreted lambda folds.
  */
object DecontamQueries {

  /** Shingle width in tokens. */
  private val NGram = 8

  /** Eval split: docs whose salted 60-bit hash bucket falls below this
    * per-cent threshold act as the held-out benchmark set.
    */
  private val EvalPct = 10

  /** Max docs kept per source domain (cur5). */
  val DomainCap = 15

  /** DuckDB twin of the positional [[WordNGrams.all]] walk. */
  private def shAllSql(nm: String) =
    s"""unnest(list_transform(
      generate_series(1, greatest(len($nm) - ${NGram - 1}, 1)),
      i -> array_to_string(list_slice($nm, i, i + ${NGram - 1}), ' ')))"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Benchmark decontamination: an eval split is designated by a salted
    // hash of the doc id (deterministic, resample-stable — the same trick
    // as cur3), and every TRAINING document sharing at least one distinct
    // 8-gram with any eval document is reported with its collision count
    // and contaminated-shingle fraction. The eval shingle set is DISTINCT
    // and broadcast: a benchmark suite is tiny relative to a training
    // corpus by construction (here 10% of docs; in production a fixed few
    // MB), so the whole check is one scan of the corpus plus a broadcast
    // hash probe — no corpus-sized shuffle at any scale.
    "dc1_decontam" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .withColumn("is_eval",
          Hash60(concat(lit("eval:"), col("doc_id").cast("string")))
            % 100 < EvalPct)
        .select(col("doc_id"), col("is_eval"),
          WordNGrams(col("text"), NGram).as("s"))
      val ex = docs.select(col("doc_id"), col("is_eval"),
        size(col("s")).cast("long").as("n_ngrams"),
        explode(col("s")).as("sh"))
      val ev = ex.filter(col("is_eval")).select(col("sh")).distinct()
      ex.filter(!col("is_eval"))
        .join(broadcast(ev), Seq("sh"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_hits"), max(col("n_ngrams")).as("n_ngrams"))
        .withColumn("contam_frac",
          col("n_hits").cast("double") / col("n_ngrams"))
        .orderBy(col("doc_id"))
    }),

    // SEMANTIC decontamination shortlist — the embedding-space companion
    // to dc1's exact n-gram probe (catches paraphrased benchmark leakage
    // that token overlap misses): for every TRAINING vector, its maximum
    // cosine to ANY eval vector (same salted eval split trick), ranked;
    // the top-50 most-suspicious docs are what a human (or a stricter
    // second-stage model) reviews. No fixed threshold: the corpus is
    // unclustered, so the operator reports the ranked frontier rather
    // than betting on an absolute cut. Scale shape: eval set broadcast
    // (benchmarks are tiny by construction), corpus scanned once, argmax
    // as one map-side-combinable struct max, global top-50 =
    // TakeOrdered.
    "dc2_semantic_decontam" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
        .withColumn("is_eval",
          Hash60(concat(lit("dc2:"), col("vec_id").cast("string")))
            % 100 < EvalPct)
      val sim = graft.sim.Similarity
      val ev = e.filter(col("is_eval"))
        .select(col("vec_id").as("eval_id"), col("embedding").as("ev"),
          sim.norm(col("embedding")).as("en"))
      e.filter(!col("is_eval"))
        .select(col("vec_id"), col("embedding").as("tv"),
          sim.norm(col("embedding")).as("tn"))
        .crossJoin(broadcast(ev))
        .select(col("vec_id"),
          struct((sim.dot(col("tv"), col("ev")) /
            (col("tn") * col("en"))).as("cos"),
            (-col("eval_id")).as("neg_eval")).as("p"))
        .groupBy(col("vec_id"))
        .agg(max(col("p")).as("m"))
        .select(col("vec_id"), col("m.cos").as("max_cos"),
          (-col("m.neg_eval")).as("nearest_eval_id"))
        .orderBy(col("max_cos").desc, col("vec_id"))
        .limit(50)
    }),

    // Passage-level duplication (Lee et al. 2022, "Deduplicating Training
    // Data Makes Language Models Better"): the fraction of a document's
    // 8-token WINDOW POSITIONS covered by a shingle that also occurs in
    // some OTHER document. Positional windows (duplicates kept) come off
    // the native word_ngrams_all kernel; the duplicated-shingle set is one
    // hash-agg shuffle keyed by shingle — "occurs in ≥2 distinct docs" is
    // detected as min(doc_id) < max(doc_id), a plain map-side-combinable
    // min/max agg instead of a two-phase COUNT(DISTINCT) expansion — and
    // the probe join reuses the same shingle-keyed exchange under AQE.
    // Nothing here is ever all-pairs.
    "dd6_passage_dups" -> ((s, dir) => {
      val ex = Tables(s, dir, "documents").select(col("doc_id"),
        explode(WordNGrams.all(col("text"), NGram)).as("sh"))
      val dup = ex.groupBy(col("sh"))
        .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
        .filter(col("lo") < col("hi"))
        .select(col("sh"), lit(1).as("is_dup"))
      ex.join(dup, Seq("sh"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_windows"),
          count(col("is_dup")).as("dup_windows"))
        .withColumn("dup_frac",
          col("dup_windows").cast("double") / col("n_windows"))
        .orderBy(col("doc_id"))
    }),

    // SPAN-level dedup (the removal step of Lee et al. 2022): for every
    // document, the exact count of TOKEN POSITIONS covered by some 8-gram
    // window that occurs more than once in the corpus — what a
    // dedup-before-training pass would actually mask out, not just the
    // window-level fraction dd6 reports. Shape: positional windows off the
    // codegen kernel (posexplode gives the 0-based window start), repeated
    // windows found by one shingle-keyed hash-agg (`count>1` is map-side
    // combinable), and coverage expands each duplicated window to its ≤8
    // clamped positions before a per-doc distinct — the explode factor is
    // bounded by the window width, never corpus-sized, and nothing is
    // all-pairs.
    "dd9_span_dedup" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").select(col("doc_id"),
        graft.text.TextFunctions.tokenCount(col("text")).as("n_tokens"),
        WordNGrams.all(col("text"), NGram).as("ws"))
      val ex = docs.select(col("doc_id"), col("n_tokens"),
        posexplode(col("ws")).as(Seq("p", "sh")))
      val dup = ex.groupBy(col("sh")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 1).select(col("sh"))
      val masked = ex.join(dup, Seq("sh"))
        .select(col("doc_id"), explode(sequence(col("p") + 1,
          least(col("p") + lit(NGram), col("n_tokens")))).as("tp"))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("tp")).as("masked_tokens"))
      docs.select(col("doc_id"), col("n_tokens"))
        .join(masked, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("masked_tokens"), lit(0L)).as("masked_tokens"))
        .withColumn("masked_frac",
          col("masked_tokens").cast("double") / col("n_tokens"))
        .orderBy(col("doc_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "dc2_semantic_decontam" -> s"""
      WITH e AS (
        SELECT vec_id, embedding,
          ('0x' || substr(md5('dc2:' || vec_id::VARCHAR), 1, 15))::BIGINT
            % 100 < $EvalPct AS is_eval
        FROM embeddings
      ), pairs AS (
        SELECT t.vec_id, ev.vec_id AS eval_id,
          ${SimQueries.cosSql("t.embedding", "ev.embedding")} AS cos
        FROM e t, e ev WHERE NOT t.is_eval AND ev.is_eval
      ), best AS (
        SELECT vec_id, cos AS max_cos, eval_id AS nearest_eval_id FROM (
          SELECT vec_id, cos, eval_id,
            ROW_NUMBER() OVER (PARTITION BY vec_id
                               ORDER BY cos DESC, eval_id) AS rn
          FROM pairs
        ) WHERE rn = 1
      )
      SELECT vec_id, max_cos, CAST(nearest_eval_id AS BIGINT)
        AS nearest_eval_id
      FROM best ORDER BY max_cos DESC, vec_id LIMIT 50""",


    "dc1_decontam" -> s"""
      WITH docs AS (
        SELECT doc_id,
          ('0x' || substr(md5('eval:' || doc_id::VARCHAR), 1, 15))::BIGINT
            % 100 < $EvalPct AS is_eval,
          regexp_split_to_array(trim(lower(text)), '\\s+') AS t
        FROM documents
      ), sh AS (
        SELECT doc_id, is_eval, list_distinct(list_transform(
          generate_series(1, greatest(len(t) - ${NGram - 1}, 1)),
          i -> array_to_string(list_slice(t, i, i + ${NGram - 1}), ' ')))
          AS s
        FROM docs
      ), ex AS (
        SELECT doc_id, is_eval, len(s) AS n_ngrams, unnest(s) AS sh FROM sh
      ), ev AS (
        SELECT DISTINCT sh FROM ex WHERE is_eval
      )
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
        CAST(MAX(n_ngrams) AS BIGINT) AS n_ngrams,
        COUNT(*)::DOUBLE / MAX(n_ngrams) AS contam_frac
      FROM ex JOIN ev USING (sh) WHERE NOT is_eval
      GROUP BY doc_id ORDER BY doc_id""",

    "dd6_passage_dups" -> s"""
      WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
        FROM documents
      ), ex AS (
        SELECT doc_id, ${shAllSql("t")} AS sh FROM toks
      ), dup AS (
        SELECT sh FROM ex GROUP BY sh HAVING MIN(doc_id) < MAX(doc_id)
      )
      SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
        CAST(COUNT(d.sh) AS BIGINT) AS dup_windows,
        COUNT(d.sh)::DOUBLE / COUNT(*) AS dup_frac
      FROM ex e LEFT JOIN dup d ON e.sh = d.sh
      GROUP BY e.doc_id ORDER BY doc_id""",

    // Positional twin of the Spark span-mask walk: window start i is
    // 1-based here vs posexplode's 0-based p (i = p + 1), coverage is the
    // same clamped [start, start + 7] token range.
    "dd9_span_dedup" -> s"""
      WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
        FROM documents
      ), pos AS (
        SELECT doc_id, t, len(t) AS n_tokens,
          unnest(generate_series(1, greatest(len(t) - ${NGram - 1}, 1)))
            AS i
        FROM toks
      ), ex AS (
        SELECT doc_id, n_tokens, i,
          array_to_string(list_slice(t, i, i + ${NGram - 1}), ' ') AS sh
        FROM pos
      ), dup AS (
        SELECT sh FROM ex GROUP BY sh HAVING COUNT(*) > 1
      ), cov AS (
        SELECT DISTINCT doc_id, tp FROM (
          SELECT e.doc_id, unnest(generate_series(e.i,
            least(e.i + ${NGram - 1}, e.n_tokens))) AS tp
          FROM ex e JOIN dup USING (sh)
        )
      ), masked AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS masked_tokens
        FROM cov GROUP BY doc_id
      )
      SELECT d.doc_id, len(d.t) AS n_tokens,
        COALESCE(m.masked_tokens, 0) AS masked_tokens,
        COALESCE(m.masked_tokens, 0)::DOUBLE / len(d.t) AS masked_frac
      FROM toks d LEFT JOIN masked m USING (doc_id)
      ORDER BY doc_id"""
  )
}
