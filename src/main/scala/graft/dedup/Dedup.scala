package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextFunctions._

/** Deduplication operators for LLM training-data pipelines: exact
  * (fingerprint hash-group), MinHash+LSH banding, SimHash, and exact n-gram
  * Jaccard verification.
  *
  * Scale shape (the whole point):
  *   - signatures/fingerprints are row-local narrow projections (codegen'd,
  *     no shuffle);
  *   - candidate generation NEVER does the O(n²) cross join — LSH bands
  *     shuffle by (band, bandHash) so only same-bucket docs meet
  *     (self-equi-join on the bucket key, AQE handles skewed buckets);
  *   - exact verification runs only on the candidate pairs.
  * At 100 TB the only wide ops are the bucket join and final dedup —
  * both hash-partitioned equi-joins, no broadcast of the corpus.
  */
object Dedup {

  /** Exact-duplicate groups: normalized-text fingerprint → group, keeping the
    * smallest id as the canonical representative. One hash shuffle.
    */
  def exactDuplicateGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Drop exact duplicates, keeping the min-id representative per fingerprint
    * (deterministic, unlike `dropDuplicates` which keeps an arbitrary row).
    * Window min over the fingerprint — one shuffle, no join.
    */
  def dropExactDuplicates(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(fingerprint(col(textCol)))
    df.withColumn("__keep", min(col(idCol)).over(w))
      .filter(col(idCol) === col("__keep"))
      .drop("__keep")
  }

  /** Mersenne prime 2^31-1: the universal-hash modulus. Products
    * `a_j * h` stay < 2^62, inside BIGINT, in any engine.
    */
  val HashPrime: Long = 2147483647L

  /** Deterministic universal-hash family coefficients (a_j, b_j), a_j != 0. */
  def hashFamily(k: Int, seed: Long = 7L): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(k)((1L + rnd.nextInt((HashPrime - 1).toInt).toLong,
      rnd.nextInt(HashPrime.toInt).toLong))
  }

  /** MinHash signatures as `(id, sig array<long>)` via explode + hash-agg.
    *
    * Two design choices, both load-bearing at scale:
    *   - `explode(shingles) → groupBy(id).agg(min(h_j) …)`: every `min` is a
    *     codegen'd, map-side-combinable aggregate (array-lambda folds run on
    *     the interpreted path and re-evaluate their input per seed —
    *     measured ~15× slower);
    *   - ONE md5 per shingle, then k affine universal-hash transforms
    *     `(a_j * h + b_j) mod (2^31-1)` (integer ops, codegen'd, exact in
    *     any engine) instead of k md5s — the md5 was the dominant cost.
    */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String,
                        shingleN: Int, k: Int): DataFrame = {
    val exploded = df.select(col(idCol).as("id"),
        explode(shingles(col(textCol), shingleN)).as("s"))
      .select(col("id"), pmod(hash60(col("s")), lit(HashPrime)).as("h"))
    val fam = hashFamily(k)
    val mins = fam.zipWithIndex.map { case ((a, b), j) =>
      min(pmod(col("h") * a + b, lit(HashPrime))).as(s"__m$j")
    }
    exploded.groupBy(col("id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("id"),
        array((0 until k).map(j => col(s"__m$j")): _*).as("sig"))
  }

  /** Candidate near-duplicate pairs via MinHash + LSH banding.
    *
    * Signature of `k = bands*rowsPerBand` min-hashes per doc; each band of
    * `rowsPerBand` consecutive signature values is hashed to a bucket; docs
    * sharing any (band, bucket) become one candidate pair. Probability a pair
    * with Jaccard J is emitted: 1 - (1 - J^r)^b.
    *
    * Plan: signatures (one agg shuffle by id) → posexplode bands (narrow) →
    * self-equi-join on (band, bucket) — shuffles by bucket key, never n².
    */
  def minhashCandidatePairs(df: DataFrame, textCol: String, idCol: String,
                            shingleN: Int = 3, bands: Int = 4,
                            rowsPerBand: Int = 3): DataFrame = {
    val banded = bandedSignatures(df, textCol, idCol, shingleN, bands,
      rowsPerBand)
    // Self-join as SHUFFLE hash join, deliberately: broadcasting the corpus's
    // own bands is wrong at scale, and with identical shuffle children
    // Catalyst's ReuseExchange computes the signature pipeline ONCE.
    banded.as("a").hint("shuffle_hash").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** `(id, band, bucket)` LSH band keys: each band of `rowsPerBand`
    * consecutive signature values md5-hashed to a bucket.
    */
  def bandedSignatures(df: DataFrame, textCol: String, idCol: String,
                       shingleN: Int, bands: Int,
                       rowsPerBand: Int): DataFrame = {
    val sig = minhashSignatures(df, textCol, idCol, shingleN,
      bands * rowsPerBand)
    sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => md5(array_join(
          transform(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
            x => x.cast("string")), ",").cast("binary"))))
        .as(Seq("band", "bucket")))
  }

  /** Batch ids dropped by INCREMENTAL near-dedup: the asymmetric twin of
    * [[nearDuplicatePairs]] — banded signatures are computed per side and
    * batch bands equi-join STORE bands, so an incoming batch never
    * self-joins or rescans the corpus. In production the store side is a
    * precomputed signature table maintained alongside the corpus; a new
    * batch then costs O(batch shingles) for its own signatures plus one
    * bucket-keyed shuffle against the store — the candidate verify re-reads
    * text for the (small) candidate set only. Shuffle-hash hint for the
    * same reason as the self-join: broadcasting a corpus-sized store is
    * wrong at scale.
    */
  def incrementalNearDupDrops(store: DataFrame, batch: DataFrame,
                              textCol: String, idCol: String, tau: Double,
                              shingleN: Int = 3, bands: Int = 4,
                              rowsPerBand: Int = 3): DataFrame = {
    val sb = bandedSignatures(store, textCol, idCol, shingleN, bands,
      rowsPerBand).withColumnRenamed("id", "store_id")
    val bb = bandedSignatures(batch, textCol, idCol, shingleN, bands,
      rowsPerBand).withColumnRenamed("id", "batch_id")
    val cand = bb.hint("shuffle_hash")
      .join(sb, Seq("band", "bucket"))
      .select(col("batch_id"), col("store_id")).distinct()
    val shS = store.select(col(idCol).as("store_id"),
      shingles(col(textCol), shingleN).as("sh_s"))
    val shB = batch.select(col(idCol).as("batch_id"),
      shingles(col(textCol), shingleN).as("sh_b"))
    cand.join(shB, "batch_id").join(shS, "store_id")
      .withColumn("jaccard", jaccard(col("sh_b"), col("sh_s")))
      .filter(col("jaccard") >= tau)
      .select(col("batch_id")).distinct()
  }

  /** LSH candidates verified with exact shingle-set Jaccard >= tau. The
    * shingle arrays are recomputed join-side from the (small) candidate set —
    * at scale, join candidates back to the corpus instead of carrying shingle
    * arrays through the bucket shuffle.
    */
  def nearDuplicatePairs(df: DataFrame, textCol: String, idCol: String,
                         tau: Double, shingleN: Int = 3, bands: Int = 4,
                         rowsPerBand: Int = 3): DataFrame = {
    val cand = minhashCandidatePairs(df, textCol, idCol, shingleN, bands, rowsPerBand)
    val sh = df.select(col(idCol).as("id"),
      shingles(col(textCol), shingleN).as("sh"))
    cand
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** LSH candidates verified with the exact OVERLAP COEFFICIENT
    * (|A∩B| / min(|A|,|B|)) — the containment dedup pass: catches a short
    * document wholly embedded in a longer one, which Jaccard misses (the
    * union in its denominator dilutes subset pairs). Same candidate
    * generation and scale shape as [[nearDuplicatePairs]].
    */
  def containmentPairs(df: DataFrame, textCol: String, idCol: String,
                       tau: Double, shingleN: Int = 3, bands: Int = 4,
                       rowsPerBand: Int = 3): DataFrame = {
    val cand = minhashCandidatePairs(df, textCol, idCol, shingleN, bands, rowsPerBand)
    val sh = df.select(col(idCol).as("id"),
      shingles(col(textCol), shingleN).as("sh"))
    cand
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("containment",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          least(size(col("sh_a")), size(col("sh_b"))).cast("double"))
      .filter(col("containment") >= tau)
      .select(col("id_a"), col("id_b"), col("containment"))
  }

  /** EXACT τ-Jaccard set-similarity self-join by COUNT-BASED token join:
    * explode each doc's distinct shingles, self-equi-join on the shingle,
    * and one hash aggregation turns shared-token row counts into exact
    * overlaps — `J = ov / (sz_a + sz_b − ov)`, an integer-ratio double
    * both engines compute identically. Zero false negatives (a pair with
    * J ≥ τ > 0 shares a token by definition) and zero array re-joins: the
    * candidate join IS the verification, so no shingle array ever moves
    * through a second shuffle and no per-pair set intersection runs.
    *
    * Scale shape: work is Σ_token df² — the intrinsic candidate volume of
    * an exact join — as one shuffle join plus one map-side-combinable
    * count agg. The length filter (τ·|a| ≤ |b|) prunes before the agg
    * output. For HIGH τ on corpora with hot tokens, where Σ df² explodes,
    * [[prefixJaccardPairs]] keeps the candidate volume down instead
    * (rarest-prefix collisions only) at the price of the df window and a
    * per-candidate set verify — that trade-off inverts at low τ, where
    * prefixes approach the whole document (|d|−⌈τ·|d|⌉+1 ≈ 0.7·|d| at
    * τ=0.3) and prune almost nothing (measured 14 s vs 1 s on the
    * driver corpus, whose 3-gram shingles have df ≤ 7).
    */
  def exactJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        tau: Double, shingleN: Int = 3): DataFrame = {
    val ex = df.select(col(idCol).as("id"),
        array_distinct(shingles(col(textCol), shingleN)).as("sh"))
      .select(col("id"), size(col("sh")).as("sz"), explode(col("sh")).as("s"))
    ex.as("a").hint("shuffle_hash").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id") &&
          // length filter: J ≥ τ forces τ·|a| ≤ |b| ≤ |a|/τ
          col("a.sz") * tau <= col("b.sz") && col("b.sz") * tau <= col("a.sz"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
      .agg(count(lit(1)).as("ov"))
      .withColumn("jaccard", col("ov").cast("double") /
        (col("sz_a") + col("sz_b") - col("ov")).cast("double"))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** EXACT τ-Jaccard self-join via PREFIX FILTERING
    * (AllPairs/PPJoin, Bayardo et al. 2007 / Xiao et al. 2008) — the
    * high-τ/hot-token twin of [[exactJaccardPairs]] (see there for when
    * each wins). Elements are ordered globally by (document
    * frequency asc, token asc) — rarest first — and each doc keeps only
    * its first `|d| − ⌈τ·|d|⌉ + 1` elements as its prefix. Any pair with
    * Jaccard ≥ τ must collide inside both prefixes (the prefix-filter
    * theorem), so the equi-join on prefix tokens is a complete candidate
    * set and the exact-Jaccard verify makes the result provably equal to
    * the all-pairs join — while the join keys are the RAREST tokens: the
    * key distribution is anti-skewed by construction, Σ df² over prefixes
    * stays bounded even when the full-token join would explode.
    *
    * Scale shape: df counts are one hash agg; prefix selection is one
    * per-doc window (partitioned by id — key-parallel); candidates are a
    * shuffle equi-join on rare tokens; verify touches candidates only.
    * No stage is O(n²), and unlike LSH there is no signature state.
    */
  def prefixJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                         tau: Double, shingleN: Int = 3): DataFrame = {
    val sets = df.select(col(idCol).as("id"),
      array_distinct(shingles(col(textCol), shingleN)).as("sh"))
    val ex = sets.select(col("id"), size(col("sh")).as("sz"),
      explode(col("sh")).as("s"))
    val dfreq = ex.groupBy(col("s")).agg(count(lit(1)).as("dfreq"))
    val byRarity = Window.partitionBy(col("id"))
      .orderBy(col("dfreq"), col("s"))
    val prefix = ex.join(dfreq, "s")
      .withColumn("rnk", row_number().over(byRarity))
      .filter(col("rnk") <= col("sz") - ceil(lit(tau) * col("sz")) + 1)
      .select(col("id"), col("s"))
    val cand = prefix.as("a").hint("shuffle_hash").join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cand
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 60-bit SimHashes as `(id, sh)` via explode + hash-agg: bit j of the
    * simhash is set iff at least half the (distinct) tokens have bit j of
    * their [[hash60]] set (majority vote, ties to 1).
    *
    * Same explode-instead-of-lambda-fold rationale as [[minhashSignatures]]:
    * 60 `sum(bit_j)` aggregates are codegen'd and partially aggregated
    * map-side; the final bit-assembly is one scalar projection.
    */
  def simhashes(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val exploded = df.select(col(idCol).as("id"),
        explode(array_distinct(tokens(col(textCol)))).as("t"))
      .select(col("id"), hash60(col("t")).as("h"))
    val bitSums = (0 until 60).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L))).as(s"__b$j"))
    exploded.groupBy(col("id"))
      .agg(count(lit(1)).as("__n"), bitSums: _*)
      .select(col("id"),
        (0 until 60).map(j =>
          when(col(s"__b$j") * 2 >= col("__n"), lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("sh"))
  }

  /** SimHash near-dup pairs: bucket by the top `prefixBits` of the simhash
    * (cheap LSH — near-identical docs share the prefix), then verify Hamming
    * distance <= maxHamming inside buckets. One shuffle by prefix bucket.
    */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 8, prefixBits: Int = 20): DataFrame = {
    // shiftright, not `/ 2^k`: double division would round the 60-bit hash
    // (53-bit mantissa) and mis-bucket vs. integer semantics.
    val s = simhashes(df, textCol, idCol)
      .withColumn("bucket", shiftright(col("sh"), 60 - prefixBits))
    // Shuffle self-join: same ReuseExchange + don't-broadcast-the-corpus
    // rationale as minhashCandidatePairs.
    s.as("a").hint("shuffle_hash").join(s.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
