package graft.joins

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed key distributions.
  *
  * AQE's skew-join split handles most sort-merge skew at runtime, but it
  * cannot help when the skewed stage is not a join shuffle it planned (e.g.
  * a join feeding a same-key window) or when a single key exceeds what one
  * task can hold even after splits. Salting is the explicit fix: left rows
  * scatter across `saltFactor` sub-partitions of their key
  * (content-hash-deterministic, so identical runs produce identical plans),
  * and the right side replicates once per salt value, keeping the join an
  * equi-join on `(key..., salt)`.
  *
  * Result == the plain join, row-for-row: each left row carries exactly one
  * salt and meets each matching right row exactly once. Valid for `inner`
  * and `left` joins (the replicated side must be the non-preserved one).
  * Cost: right side × saltFactor — use for small-to-medium right sides
  * against a skewed big left, the classic hot-key dimension case.
  */
object SaltedJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left" ||
      joinType == "left_outer", s"unsupported join type $joinType")
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(saltFactor.toLong)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    saltedLeft.join(saltedRight, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
