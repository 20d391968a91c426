package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis primitives for LLM training-data pipelines, built entirely
  * from codegen'd Spark built-ins (no UDFs): tokenization, token counting
  * (whitespace + a BPE-ish regex), quality components, n-gram language-ID,
  * document fingerprinting, shingling, and MinHash signatures.
  *
  * Determinism contract: every primitive here has an exact DuckDB-SQL twin
  * (see [[graft.ops.TextQueries]] / [[graft.ops.DedupQueries]]) — hashes are
  * md5-derived (identical hex in both engines), and all ratio math is IEEE
  * double with the same operation order, so results hash-match the oracle.
  *
  * Scale shape: all functions are row-local (narrow) — they fuse into
  * whole-stage codegen with the surrounding scan and shuffle nothing.
  */
object TextFunctions {

  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy: runs of letters, runs of digits, or single
    * non-alphanumeric marks — the classic pre-tokenizer split used before
    * byte-pair merging. Counts pieces, not bytes.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Small fixed English stoplist (function words present in any corpus). */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "to", "and", "in", "is", "it", "on")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column): Column = {
    val stop = array(Stopwords.map(lit): _*)
    size(filter(tokens(text), w => array_contains(stop, w)))
      .cast("double") / tokenCount(text)
  }

  /** Type-token ratio (lexical diversity). */
  def typeTokenRatio(text: Column): Column =
    size(array_distinct(tokens(text))).cast("double") / tokenCount(text)

  /** Mean token length (chars excluding whitespace / token count). */
  def meanTokenLen(text: Column): Column =
    length(regexp_replace(text, "\\s+", "")).cast("double") / tokenCount(text)

  /** Composite quality score in [0,1]: length saturation + diversity +
    * content-word share. The exact weights are a heuristic; what matters is
    * the deterministic double math.
    */
  def qualityScore(text: Column): Column =
    lit(0.4) * least(tokenCount(text).cast("double") / lit(100.0), lit(1.0)) +
      lit(0.3) * typeTokenRatio(text) +
      lit(0.3) * (lit(1.0) - stopwordRatio(text))

  /** Occurrences of literal substring `sub` in `text` (replace-and-measure —
    * no regex, identical in any engine).
    */
  def occurrences(text: Column, sub: String): Column =
    (length(text) - length(replace(text, lit(sub), lit("")))) / lit(sub.length)

  /** Character-bigram/trigram markers per language for the n-gram language-ID
    * heuristic. Deliberately tiny — the point is the deterministic argmax
    * pipeline, not linguistic accuracy.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("th", "er", "on"),
    "de" -> Seq("sch", "ei", "der"),
    "fr" -> Seq("ou", "le", "es"),
    "es" -> Seq("la", "os", "de")
  )

  /** Per-language marker-hit score (sum of marker occurrences, normalized by
    * text length).
    */
  def langScore(text: Column, markers: Seq[String]): Column =
    markers.map(m => occurrences(lower(text), m).cast("double"))
      .reduce(_ + _) / length(text)

  /** Argmax language, ties broken by declaration order: a cascading CASE —
    * each language wins if its score >= every later language's score.
    */
  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (l, ms) => l -> langScore(text, ms) }
    scores.init.zipWithIndex.foldRight(lit(scores.last._1)) {
      case (((lang, sc), i), elseCol) =>
        val laterScores = scores.drop(i + 1).map(_._2)
        when(laterScores.map(sc >= _).reduce(_ && _), lang).otherwise(elseCol)
    }
  }

  /** Whitespace-normalized lowercase text — the canonical form hashed by
    * [[fingerprint]] and the char-gram sketch. Project it ONCE per row before
    * any per-gram operation: as an outer reference inside a lambda it would
    * re-evaluate (regexp and all) per array element.
    */
  def normalizeText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Whole-document fingerprint: md5 of the whitespace-normalized lowercase
    * text — byte-identical to DuckDB's `md5(...)` hex output.
    */
  def fingerprint(text: Column): Column =
    md5(normalizeText(text).cast("binary"))

  /** 60-bit positive hash from the md5 prefix — the shared cross-engine
    * hash for MinHash/LSH (`('0x' || substr(md5(x),1,15))::BIGINT` in
    * DuckDB), computed by the native [[graft.functions.Hash60Expr]]
    * (digest bytes directly, no hex-string round-trip).
    */
  def hash60(c: Column): Column = graft.functions.Hash60(c)

  /** Rolling-hash sketch positions 1..len-n+1 for a PRE-PROJECTED normalized
    * text attribute. Used by the explode+min-agg sketch in
    * [[graft.ops.TextQueries]] — the lambda-fold form would re-evaluate the
    * normalization per gram and run interpreted (measured 27 s → 2 s at
    * sf0.1 after the explode rewrite).
    */
  def charGramPositions(normCol: Column, n: Int): Column =
    sequence(lit(1), greatest(length(normCol) - lit(n - 1), lit(1)))

  /** Distinct word n-gram shingles (space-joined), via the native
    * [[WordNGramsExpr]] — one generated pass per row instead of an
    * interpreted transform re-walking the token array per position.
    */
  def shingles(text: Column, n: Int): Column = WordNGrams(text, n)

  /** Exact Jaccard similarity of two shingle sets (arrays assumed distinct).
    * (MinHash/SimHash signature computation lives in [[graft.dedup.Dedup]] as
    * explode + hash-agg — array-lambda folds over a per-seed hash would run
    * interpreted and re-evaluate the array per seed.)
    */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")
}
