package graft.joins

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Two-phase `lead(1)` for HOT-KEY change logs — the skew fallback for the
  * one plan shape AQE cannot repair.
  *
  * `lead(ts) over (partition by key order by lsn)` requires every row of a
  * key in ONE task's sorted run; AQE's skew handling splits joins and
  * aggregates, but a Window partition is indivisible by definition. A
  * pathological key with ~10⁶⁺ changes (a stuck upstream row, a
  * heartbeat id) therefore serializes that key's whole history into one
  * task — bounded memory (window sorts spill) but unbounded wall clock.
  *
  * This operator computes the identical lead with NO per-key task bound:
  *
  *   1. `repartitionByRange(key, order)` + `sortWithinPartitions` — the
  *      global sort order is preserved ACROSS partitions, so a hot key
  *      spans many consecutive partitions instead of serializing into one;
  *   2. within each partition, lead is a one-row lookahead (streaming, no
  *      state);
  *   3. the only cross-partition question — "what follows my LAST row?" —
  *      is answered by each partition's HEAD row: one row per partition,
  *      collected to the driver (bounded, O(numPartitions) — the same
  *      bounded-metadata standard as the engine's bucket-id collects) and
  *      broadcast back. Because range partitioning keeps the global order,
  *      the successor of partition p's last row is the head of the next
  *      non-empty partition — same key ⇒ that head's value is the lead;
  *      different key ⇒ the key ends here (no later partition can hold it).
  *
  * Contract: `orderCol` values are unique per key (a change log's LSN); on
  * ties the plain Window's own output is undefined too. Output = input
  * columns + `as` (the next row's `leadOf` within the key, null at key
  * end) — bit-identical to the Window formulation, asserted by
  * RangeLeadSpec and the 1M-hot-key soak.
  *
  * This is deliberately the RDD path: the fallback exists precisely when
  * declarative Window cannot be made parallel, and the per-row work is a
  * field copy. Default paths stay on codegen'd Window — use this when key
  * skew is measured, not speculatively.
  */
object RangeLead {

  /** @param df       input rows
    * @param key      partition key column
    * @param orderCol total-order column within a key
    * @param leadOf   column whose next-row value to surface
    * @param as       output column name
    * @param numPartitions 0 = spark.sql.shuffle.partitions
    */
  def withLead(df: DataFrame, key: String, orderCol: String, leadOf: String,
               as: String, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val part = df.repartitionByRange(n, col(key), col(orderCol))
      .sortWithinPartitions(col(key), col(orderCol))
    val schema = part.schema
    val ki = schema.fieldIndex(key)
    val li = schema.fieldIndex(leadOf)

    val rdd = part.rdd
    // pass 1: each partition's head row (one row per non-empty partition)
    val heads: Map[Int, Row] = rdd.mapPartitionsWithIndex { (p, it) =>
      if (it.hasNext) Iterator((p, it.next())) else Iterator.empty
    }.collect().toMap
    val bc = spark.sparkContext.broadcast(heads)

    // pass 2: streaming one-row lookahead; the last row per partition
    // consults the next non-empty partition's head
    val out = rdd.mapPartitionsWithIndex { (p, it) =>
      val hs = bc.value
      val maxP = if (hs.isEmpty) -1 else hs.keys.max
      // successor head after partition p (partitions between may be empty)
      val nextHead: Option[Row] =
        Iterator.range(p + 1, maxP + 1).flatMap(hs.get).nextOption()
      new Iterator[Row] {
        private val buf = it.buffered
        def hasNext: Boolean = buf.hasNext
        def next(): Row = {
          val r = buf.next()
          val succ: Option[Row] =
            if (buf.hasNext) Some(buf.head) else nextHead
          val lead = succ match {
            case Some(s) if s.get(ki) == r.get(ki) => s.get(li)
            case _ => null
          }
          Row.fromSeq(r.toSeq :+ lead)
        }
      }
    }
    val outSchema = StructType(schema.fields :+
      schema.fields(li).copy(name = as, nullable = true))
    spark.createDataFrame(out, outSchema)
  }
}
