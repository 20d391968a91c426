package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.LogReg
import graft.text.TextFunctions._

/** TRAINED-model operators over the document corpus: a distributed
  * logistic-regression quality classifier (discriminative) and a Naive
  * Bayes character-bigram language classifier (generative) — the two
  * model-based filters a pretraining-data pipeline runs after the
  * heuristic passes (tx2 quality / tx3 lang-ID). Both train INSIDE the
  * engine with deterministic arithmetic, so the DuckDB oracle re-derives
  * training and inference bit-for-bit:
  *
  *   - cur13 quantizes per-row gradients to an integer grid and uses a
  *     rational sigmoid (see [[graft.model.LogReg]]); the oracle unrolls
  *     the three GD iterations as chained CTEs, exactly like the PageRank
  *     and k-means oracles;
  *   - tx23 quantizes per-bigram log-probabilities to the 2^-20 ln grid
  *     (the repo-standard trick for cross-libm ln), after which every
  *     document score is an exact BIGINT sum — order-independent.
  */
object LearnedQueries {

  private val LogGrid = 1048576L

  /** Teacher bar at the corpus quality MEDIAN (≈0.641 on the driver
    * documents), not cur1's 0.6 curation bar: the quality distribution
    * concentrates around 0.6, so a 0.6 teacher is 79% one class and a
    * few GD rounds can't beat predict-the-majority. At 0.64 the classes
    * balance (~51/49) and six full-batch rounds reach ~0.94 accuracy —
    * a model that demonstrably LEARNED, not a base-rate echo.
    */
  private val QualityBar = 0.64
  private val LrIters = 6
  private val XCols = Seq("x1", "x2", "x3")

  /** Per-doc features: length saturation, type-token ratio, stopword
    * ratio — the exact terms of tx2's quality score, so the teacher label
    * (quality ≥ bar) is a LINEAR threshold of the features and GD
    * provably converges toward the separating hyperplane.
    */
  private def featFrame(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      col("doc_id"),
      least(tokenCount(col("text")).cast("double") / lit(100.0), lit(1.0))
        .as("x1"),
      typeTokenRatio(col("text")).as("x2"),
      stopwordRatio(col("text")).as("x3"),
      when(qualityScore(col("text")) >= QualityBar, 1.0).otherwise(0.0)
        .as("y"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Distributed logistic-regression training (3 full-batch GD rounds,
    // one hash-agg job each; driver state = 4 weights) + scan-side
    // inference with the learned weights as plan literals — the deployed
    // shape of a trained quality filter. Output: per-doc probability,
    // prediction, and teacher label.
    "cur13_lr_quality_model" -> ((s, dir) => {
      // the feature frame is re-read once per GD iteration (6×) plus the
      // inference pass — materialize the narrow (id, x1..x3, y) projection
      // once instead of re-running the text kernels over the corpus 7×
      val feats = graft.graph.GraphOps.checkpoint(featFrame(s, dir))
      val w = LogReg.train(feats, XCols, "y", iters = LrIters)
      val p = LogReg.fastSigmoid(LogReg.margin(w, XCols))
      feats.select(col("doc_id"), p.as("p_quality"),
          when(p >= 0.5, 1).otherwise(0).as("pred"),
          col("y").cast("int").as("y_teacher"))
        .orderBy(col("doc_id"))
    }),

    // Naive Bayes char-bigram language ID: train on the %5≠0 split
    // (per-lang Laplace-smoothed bigram log-probs + log priors, all on
    // the integer ln grid), score the held-out %5=0 split, report the
    // confusion matrix — see graft.model.NaiveBayesText for the scale
    // shape. NOTE on this corpus: the driver's `lang` column is
    // independent of the text (every doc is the same token soup; verified
    // — tx12's heuristic confusion shows the same), so held-out accuracy
    // is chance BY CONSTRUCTION of the data; the gate pins the full
    // train→score→argmax arithmetic cross-engine, and
    // NaiveBayesTextSpec proves the same pipeline reaches ≥90% accuracy
    // on a fixture corpus whose labels DO carry bigram signal.
    "tx23_nb_langid" -> ((s, dir) =>
      graft.model.NaiveBayesText.heldOutConfusion(
          Tables(s, dir, "documents").select(
            col("doc_id").as("id"), col("lang").as("label"), col("text")),
          evalMod = 5)
        .select(col("label_true").as("lang_true"),
          col("label_pred").as("lang_pred"), col("n_docs"))
        .orderBy(col("lang_true"), col("lang_pred")))
  )

  /** Unrolled GD as chained CTEs — same grid, same rational sigmoid, same
    * left-to-right double chains as [[graft.model.LogReg]].
    */
  private def lrOracle: String = {
    val G = "1048576.0"
    val iters = (1 to LrIters).map { t =>
      s"""p$t AS (
        SELECT f.*, 0.5 + 0.5 * z / (1.0 + abs(z)) AS p
        FROM (SELECT f0.*, ((w.w0 + w.w1 * x1) + w.w2 * x2) + w.w3 * x3 AS z
              FROM feats f0, wt${t - 1} w) f
      ), g$t AS (
        SELECT
          SUM(CAST(round(((p - y) * 1.0) * $G) AS BIGINT)) AS s0,
          SUM(CAST(round(((p - y) * x1) * $G) AS BIGINT)) AS s1,
          SUM(CAST(round(((p - y) * x2) * $G) AS BIGINT)) AS s2,
          SUM(CAST(round(((p - y) * x3) * $G) AS BIGINT)) AS s3
        FROM p$t
      ), wt$t AS (
        SELECT w.w0 - 4.0 * (CAST(g.s0 AS DOUBLE) / nn.n / $G) AS w0,
               w.w1 - 4.0 * (CAST(g.s1 AS DOUBLE) / nn.n / $G) AS w1,
               w.w2 - 4.0 * (CAST(g.s2 AS DOUBLE) / nn.n / $G) AS w2,
               w.w3 - 4.0 * (CAST(g.s3 AS DOUBLE) / nn.n / $G) AS w3
        FROM wt${t - 1} w, g$t g, nn
      )"""
    }.mkString(", ")
    s"""
      WITH feats AS (
        SELECT doc_id,
          least(${TextQueries.NT}::DOUBLE / 100.0, 1.0) AS x1,
          ${TextQueries.ttrSql} AS x2,
          ${TextQueries.stopRatioSql} AS x3,
          CASE WHEN (${TextQueries.qualitySql}) >= $QualityBar
               THEN 1.0 ELSE 0.0 END AS y
        FROM documents
      ), nn AS (SELECT COUNT(*)::DOUBLE AS n FROM feats),
      wt0 AS (SELECT 0.0::DOUBLE AS w0, 0.0::DOUBLE AS w1,
                     0.0::DOUBLE AS w2, 0.0::DOUBLE AS w3),
      $iters
      SELECT doc_id, p AS p_quality,
        CASE WHEN p >= 0.5 THEN 1 ELSE 0 END AS pred,
        CAST(y AS INT) AS y_teacher
      FROM (
        SELECT f.doc_id, f.y, 0.5 + 0.5 * z / (1.0 + abs(z)) AS p
        FROM (SELECT f0.*, ((w.w0 + w.w1 * x1) + w.w2 * x2) + w.w3 * x3 AS z
              FROM feats f0, wt$LrIters w) f
      )
      ORDER BY doc_id"""
  }

  private def nbOracle: String = s"""
      WITH docs AS (
        SELECT doc_id, lang, lower(text) AS nt FROM documents
      ), db AS (
        SELECT doc_id, lang,
          unnest(CASE WHEN length(nt) < 2 THEN []
            ELSE list_transform(generate_series(1, length(nt) - 1),
                                i -> substr(nt, i, 2)) END) AS bg
        FROM docs
      ), train AS (
        SELECT * FROM db WHERE doc_id % 5 != 0
      ), counts AS (
        SELECT lang, bg, COUNT(*) AS c FROM train GROUP BY 1, 2
      ), totals AS (
        SELECT lang, CAST(SUM(c) AS BIGINT) AS tl FROM counts GROUP BY 1
      ), vv AS (
        SELECT COUNT(DISTINCT bg) AS v FROM train
      ), tdocs AS (
        SELECT doc_id, lang FROM documents WHERE doc_id % 5 != 0
      ), tn AS (SELECT COUNT(*) AS t FROM tdocs),
      priors AS (
        SELECT lang,
          CAST(round(ln(COUNT(*)::DOUBLE / (SELECT t::DOUBLE FROM tn))
            * $LogGrid.0) AS BIGINT) AS prior
        FROM tdocs GROUP BY 1
      ), lp AS (
        SELECT c.lang, c.bg,
          CAST(round(ln((c.c + 1)::DOUBLE / (t.tl + vv.v)::DOUBLE)
            * $LogGrid.0) AS BIGINT) AS lp
        FROM counts c JOIN totals t USING (lang), vv
      ), fl AS (
        SELECT lang,
          CAST(round(ln(1.0 / (tl + vv.v)::DOUBLE) * $LogGrid.0) AS BIGINT)
            AS fl
        FROM totals, vv
      ), evalcnt AS (
        SELECT doc_id, lang AS lang_true, bg, COUNT(*) AS k
        FROM db WHERE doc_id % 5 = 0 GROUP BY 1, 2, 3
      ), scored AS (
        SELECT e.doc_id, e.lang_true, f.lang AS lang_cand,
          CAST(SUM(e.k * COALESCE(l.lp, f.fl)) AS BIGINT)
            + MAX(p.prior) AS s
        FROM evalcnt e
        CROSS JOIN fl f
        LEFT JOIN lp l ON l.lang = f.lang AND l.bg = e.bg
        JOIN priors p ON p.lang = f.lang
        GROUP BY 1, 2, 3
      ), pred AS (
        SELECT doc_id, lang_true, lang_cand,
          ROW_NUMBER() OVER (PARTITION BY doc_id
                             ORDER BY s DESC, lang_cand) AS rn
        FROM scored
      )
      SELECT lang_true, lang_cand AS lang_pred, COUNT(*) AS n_docs
      FROM pred WHERE rn = 1
      GROUP BY 1, 2 ORDER BY 1, 2"""

  val oracleSql: Map[String, String] = Map(
    "cur13_lr_quality_model" -> lrOracle,
    "tx23_nb_langid" -> nbOracle
  )
}
