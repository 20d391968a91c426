package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions.tokens

/** Byte-pair-encoding tokenizer TRAINING and ENCODING as relational plans —
  * the vocabulary-construction step every LLM data pipeline runs before
  * token counting means anything (reference scope: the `documents` table;
  * cf. Sennrich et al. 2016, the public BPE algorithm).
  *
  * Scale shape: training never touches the corpus after ONE hash-agg that
  * collapses it to the distinct-word frequency table (O(vocab) rows — the
  * same few hundred thousand rows whether the corpus is 1 GB or 100 TB).
  * Each of the `rounds` merge iterations is a pair-explode + hash-agg over
  * that small table whose global top-1 row is COLLECTED — the merge list is
  * O(rounds) driver state, so the per-round vocab rewrite stacks as a lazy
  * narrow literal-replace over the one checkpointed collapse (one job per
  * round, nothing rewritten to storage). Encoding is scan-side: the learned
  * merge list rides in the [[graft.functions.BpeApply]] kernel as reference
  * objects and applies as a left-to-right `replace` fold inside one codegen
  * stage — no shuffle, no state, embarrassingly parallel over 100 TB.
  *
  * Cross-engine determinism: every quantity is an integer count; the merge
  * choice tie-breaks (count DESC, pair ASC) on binary string order; and the
  * rewrite uses literal non-overlapping left-to-right `replace`, which Spark
  * and DuckDB implement identically. Symbols are wrapped as `(sym)` so a
  * pair's search string `(a)(b)` can never straddle a symbol boundary —
  * adjacent matches share no characters, making replace-all well-defined.
  */
object Bpe {

  /** Word → wrapped initial symbol string: "cat" → "(c)(a)(t)(_)". The
    * trailing `(_)` is the end-of-word sentinel, so learned merges
    * distinguish word-final from word-internal contexts (classic BPE).
    */
  def wrapped(word: Column): Column =
    concat(regexp_replace(word, "(.)", "($1)"), lit("(_)"))

  /** Distinct-word frequency table over alphabetic tokens: (sym_str, freq).
    * The ONE corpus-sized pass; everything downstream is O(vocab).
    */
  def vocab(docs: DataFrame): DataFrame =
    docs.select(explode(tokens(col("text"))).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(wrapped(col("w")).as("sym_str"), col("freq"))

  /** Adjacent-pair counts weighted by word frequency: (a, b, cnt). */
  private def pairCounts(v: DataFrame): DataFrame =
    v.select(col("freq"),
        split(regexp_replace(col("sym_str"), "^\\(|\\)$", ""), "\\)\\(")
          .as("syms"))
      .select(col("freq"), explode(expr(
        // x = syms[i+1] (1-based) over the size-1 prefix; partner follows.
        "transform(slice(syms, 1, size(syms) - 1), " +
          "(x, i) -> struct(x AS a, element_at(syms, i + 2) AS b))")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  /** Train `rounds` merges. Returns (merge table: round | sym_a | sym_b |
    * pair_cnt, final vocab: sym_str | freq).
    *
    * The merge list is O(rounds) rows — bounded DRIVER state — so each
    * round runs exactly ONE job: the pair-count agg's global top-1 row is
    * collected (TakeOrdered — deterministic (cnt DESC, a, b) order), and
    * the vocab rewrite stacks as a LAZY narrow literal-replace projection
    * on the one checkpointed corpus collapse. Round r's agg re-applies
    * r−1 literal replaces to the checkpointed vocab scan — O(vocab·r)
    * narrow work that replaces the former per-round checkpoint+broadcast
    * pair of jobs (17 actions → rounds+1, and the vocab table is written
    * once, not `rounds` times).
    */
  def train(docs: DataFrame, rounds: Int): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    var v = graft.graph.GraphOps.checkpoint(vocab(docs))
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val b = pairCounts(v)
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
        .collect()(0)
      val (a, bb) = (b.getString(0), b.getString(1))
      merges += ((r, a, bb, b.getLong(2)))
      v = v.select(
        replace(col("sym_str"), lit(s"($a)($bb)"), lit(s"($a$bb)"))
          .as("sym_str"),
        col("freq"))
    }
    import spark.implicits._
    (merges.result().toDF("round", "sym_a", "sym_b", "pair_cnt"), v)
  }

  /** Encode every document under a learned merge table: doc_id |
    * n_alpha_tokens | n_pieces. The merge list collapses to ONE broadcast
    * row (an array sorted by round) and applies as a fold of literal
    * replaces — the whole encode is a narrow scan-side projection plus one
    * per-doc hash agg.
    */
  def encode(docs: DataFrame, merges: DataFrame): DataFrame = {
    // The merge list is O(rounds) rows — collect it (bounded metadata) and
    // apply the replace fold through the native BpeApply kernel: the whole
    // encode is ONE scan-side projection, no broadcast, no per-token
    // higher-order-function dispatch.
    val ms = merges.orderBy(col("round"))
      .select(col("sym_a"), col("sym_b")).collect()
      .map(r => (s"(${r.getString(0)})(${r.getString(1)})",
        s"(${r.getString(0)}${r.getString(1)})"))
    val perDoc = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .select(col("doc_id"),
        graft.functions.BpeApply(wrapped(col("w")), ms).as("enc"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_alpha_tokens"),
        sum(length(col("enc")) - length(replace(col("enc"), lit("("))))
          .as("n_pieces"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_alpha_tokens"), lit(0L)).as("n_alpha_tokens"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"))
  }

  // ---------------------------------------------------------------- oracle

  /** DuckDB twins. `oracleCtes(rounds)` renders the shared training chain
    * v0 → (p1, b1, v1) → … so both gates' SQL stays generated, not
    * hand-maintained.
    */
  private[graft] val WrapSql =
    raw"regexp_replace(w, '(.)', '(\1)', 'g') || '(_)'"

  private[graft] def oracleCtes(rounds: Int): String = {
    val v0 = raw"""v0 AS (
      SELECT $WrapSql AS sym_str, COUNT(*) AS freq
      FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
            FROM documents)
      WHERE regexp_matches(w, '^[a-z]+$$')
      GROUP BY 1
    )"""
    val steps = (1 to rounds).map { r =>
      s"""p$r AS (
        SELECT struct_extract(p, 1) AS a, struct_extract(p, 2) AS b,
          CAST(SUM(freq) AS BIGINT) AS cnt
        FROM (
          SELECT freq,
            unnest(list_zip(syms[1:len(syms)-1], syms[2:len(syms)])) AS p
          FROM (SELECT freq, string_split(sym_str[2:-2], ')(') AS syms
                FROM v${r - 1})
        ) GROUP BY 1, 2
      ), b$r AS (
        SELECT a, b, cnt FROM p$r ORDER BY cnt DESC, a, b LIMIT 1
      ), v$r AS (
        SELECT replace(sym_str, '(' || b$r.a || ')(' || b$r.b || ')',
          '(' || b$r.a || b$r.b || ')') AS sym_str, freq
        FROM v${r - 1}, b$r
      )"""
    }
    (v0 +: steps).mkString("WITH ", ", ", "")
  }

  private[graft] def mergesOracle(rounds: Int): String = {
    val rows = (1 to rounds).map(r =>
      s"SELECT $r AS round, a AS sym_a, b AS sym_b, cnt AS pair_cnt FROM b$r")
    s"""${oracleCtes(rounds)}
      SELECT * FROM (${rows.mkString(" UNION ALL ")}) ORDER BY round"""
  }

  /** Training chain + per-doc piece counts, ending in a `pieces(doc_id,
    * n_alpha_tokens, n_pieces)` CTE — composable (the tokenize→pack gate
    * appends a running-sum CTE on top).
    */
  private[graft] def encodeCtes(rounds: Int): String = {
    val inner = (1 to rounds).foldLeft("wrapped") { (acc, r) =>
      s"replace($acc, '(' || b$r.a || ')(' || b$r.b || ')', " +
        s"'(' || b$r.a || b$r.b || ')')"
    }
    val bs = (1 to rounds).map(r => s"b$r").mkString(", ")
    raw"""${oracleCtes(rounds)}, toks AS (
        SELECT doc_id, $WrapSql AS wrapped
        FROM (SELECT doc_id,
                unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
              FROM documents)
        WHERE regexp_matches(w, '^[a-z]+$$')
      ), enc AS (
        SELECT doc_id, $inner AS enc FROM toks, $bs
      ), agg AS (
        SELECT doc_id, COUNT(*) AS n_alpha_tokens,
          CAST(SUM(length(enc) - length(replace(enc, '(', ''))) AS BIGINT)
            AS n_pieces
        FROM enc GROUP BY 1
      ), pieces AS (
        SELECT d.doc_id, COALESCE(a.n_alpha_tokens, 0) AS n_alpha_tokens,
          COALESCE(a.n_pieces, 0) AS n_pieces
        FROM (SELECT doc_id FROM documents) d LEFT JOIN agg a USING (doc_id)
      )"""
  }

  private[graft] def encodeOracle(rounds: Int): String =
    s"""${encodeCtes(rounds)}
      SELECT doc_id, n_alpha_tokens, n_pieces FROM pieces ORDER BY doc_id"""
}
