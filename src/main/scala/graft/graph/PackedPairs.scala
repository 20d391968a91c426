package graft.graph

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pack a (u, v) id pair into ONE long key for pair-aggregation shuffles
  * (guide §2.3, shuffle fewer bytes): the wedge-enumeration gates
  * hash-aggregate ~order-of-10M exploded pairs, and carrying one 8-byte
  * key instead of two halves the grouping key's bytes and hashes/compares
  * a single column. Only valid when BOTH ids fit an unsigned 31-bit slot —
  * the ids are BIGINT by schema, so callers gate the packed path on the
  * MEASURED id range (`fits`, the GraphOps.BroadcastNodeCap pattern:
  * measured data decides, never an assumed width) and keep the two-column
  * aggregation as the any-scale fallback. Both paths group by exactly the
  * same pair equality, and for in-range ids the packed key's numeric order
  * IS the (u, v) lexicographic order (u occupies the high bits), so
  * order-by/tie-break semantics are unchanged.
  */
object PackedPairs {

  /** Exclusive id cap for the packed path: [0, 2^31). */
  val IdCap: Long = 1L << 31

  /** True iff every id in [minId, maxId] packs losslessly. */
  def fits(minId: Long, maxId: Long): Boolean =
    minId >= 0L && maxId < IdCap

  /** `(u << 32) | v` — injective for ids in [0, IdCap), ascending in
    * (u, v) lexicographic order.
    */
  def pack(u: Column, v: Column): Column =
    shiftleft(u, 32).bitwiseOR(v)

  /** High half: the original `u`. */
  def hi(pr: Column): Column = shiftright(pr, 32)

  /** Low half: the original `v`. */
  def lo(pr: Column): Column = pr.bitwiseAND(lit((1L << 32) - 1))
}
