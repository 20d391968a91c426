package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT frequent-token mining without a full-vocabulary shuffle — the
  * two-pass heavy-hitter pattern a 100 TB corpus needs.
  *
  * The naive `explode → groupBy(token)` shuffles EVERY token occurrence:
  * at corpus scale that is the biggest shuffle in the whole pipeline, and
  * it materializes the full long-tail vocabulary only to discard it.
  * Instead:
  *
  *   - Pass 1 — candidates: per-partition Misra-Gries summaries of
  *     `capacity` counters via `mapPartitions` (O(capacity) memory, one
  *     streaming pass). MG's guarantee composes across partitions: a
  *     partition only fails to surface a token with local count ≤
  *     n_p/capacity, so a token missing from EVERY summary has global
  *     count ≤ Σ n_p/capacity = n/capacity. The candidate union
  *     (≤ capacity × partitions rows, usually tiny after distinct) is
  *     therefore a SUPERSET of every token with count > n/capacity.
  *   - Pass 2 — exact verify: re-scan with the broadcast candidate set as
  *     a filter; only candidate occurrences reach the (now tiny) hash
  *     aggregation. Counts are exact, so the output equals the naive
  *     GROUP BY ... HAVING count >= threshold exactly — provably, when
  *     `threshold > n/capacity` (require-checked at runtime; size
  *     `capacity` ≥ n/threshold from table stats in production).
  *
  * Pass 1 is deliberately the non-codegen `mapPartitions` path: MG's
  * decrement-all step has no declarative equivalent, the summary is
  * O(capacity) per task, and pass 2's exactness makes the candidate
  * set's run-to-run nondeterminism unobservable in the output.
  */
object HeavyHitters {

  def frequentTokens(docs: DataFrame, textCol: String, threshold: Long,
                     capacity: Int = -1): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(threshold >= 1 && (capacity >= 1 || capacity == -1))

    val toks = docs.select(
      explode(TextFunctions.tokens(col(textCol))).as("tok"))

    // one cheap scalar pass for the exactness guard (production would use
    // table stats instead of counting)
    val n = toks.count()
    // -1 = AUTO: the smallest power-of-two-ish size the guarantee needs,
    // floor 4096 — the summary is O(cap) per task, and n/threshold is
    // exactly the point below which a qualifying token could be missed.
    // A fixed default here is a scale bug: it silently stops satisfying
    // the guard as the corpus grows (measured at the 10× soak rung).
    val cap =
      if (capacity > 0) capacity
      else math.max(4096L, n / threshold + 1).min(Int.MaxValue).toInt
    require(threshold > n / cap,
      s"threshold $threshold is not > n/capacity = $n/$cap = " +
        s"${n / cap}: Misra-Gries candidates could miss a qualifying " +
        s"token — raise capacity to at least ${n / threshold + 1}")

    val candidates = toks.as[String].mapPartitions { it =>
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        counts.get(t) match {
          case Some(c) => counts(t) = c + 1
          case None if counts.size < cap => counts(t) = 1L
          case None => // decrement-all; drop counters that reach zero
            counts.keysIterator.toList.foreach { k =>
              val v = counts(k) - 1
              if (v == 0L) counts.remove(k) else counts(k) = v
            }
        }
      }
      counts.keysIterator
    }.toDF("tok").distinct()

    toks.join(broadcast(candidates), Seq("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") >= threshold)
  }
}
