package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TRIGRAM SUBSTRING INDEX — the inverted index behind fast `%pattern%`
  * search (pg_trgm's trick, Spark-shaped): a standing posting table
  * (trigram → doc_id) answers an arbitrary substring query with K
  * posting-list lookups + an intersection, instead of a full corpus scan
  * per query.
  *
  * Correctness contract: a doc contains `pattern` ⇒ it contains every
  * trigram of the pattern ⇒ it survives the intersection — so the
  * candidate set is a SUPERSET of the answer and the final
  * `contains(text, pattern)` verify makes the result EXACTLY equal to
  * the naive LIKE scan (the index can only over-approximate, never
  * miss). The gate's oracle is therefore the plain LIKE filter.
  *
  * Scale shape: the index builds with one scan through the
  * `char_ngram_counts` kernel (scan-side, distinct trigrams per doc) and
  * one distinct-ish shuffle; a query touches only the K query-trigram
  * posting lists (predicate pushed to the parquet scan — at lake scale
  * the posting table would additionally be bucketed/partitioned by
  * trigram so the lookups open only their buckets), intersects by
  * doc-keyed count, and verifies candidates with one semi-joined read.
  * Selectivity degrades gracefully: a pattern of common trigrams just
  * yields a bigger candidate set, never a wrong one.
  */
object TrigramIndex {

  /** The posting table (ng, doc_id), one row per DISTINCT trigram per
    * doc (`char_ngram_counts` emits each distinct n-gram once).
    */
  def build(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(CharNgrams(col(textCol), 3)).as("e"))
      .select(col("e.ng").as("ng"), col("doc_id"))

  /** All doc ids whose text contains `pattern`, via the index: posting
    * lookups → intersection → verify. Exactly equals
    * `docs.filter(contains(text, pattern))`.
    */
  def search(index: DataFrame, docs: DataFrame, idCol: String,
             textCol: String, pattern: String): DataFrame = {
    require(pattern.length >= 3,
      s"pattern '$pattern' shorter than a trigram — index lookups need " +
        "at least 3 chars (shorter patterns must scan)")
    val qgrams = pattern.sliding(3).toSeq.distinct
    val cands = index.filter(col("ng").isin(qgrams: _*))
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("ng")).as("k"))
      .filter(col("k") === qgrams.length)
      .select(col("doc_id").as(idCol))
    docs.join(cands, Seq(idCol), "left_semi")
      .filter(col(textCol).contains(pattern))
      .select(col(idCol))
  }
}
