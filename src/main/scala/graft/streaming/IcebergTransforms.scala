package graft.streaming

/** Iceberg partition-transform semantics for READ-SIDE pruning — the
  * spec's Appendix B hash and the transform result ranges, built from
  * the open table spec (iceberg.apache.org/spec) with no Iceberg
  * library on the classpath.
  *
  * The hash is STANDARD murmur3_x86_32 (seed 0, Guava-compatible).
  * Spark's own `Murmur3_x86_32` is deliberately NOT reused: its tail
  * handling for lengths that are not a multiple of 4 diverges from the
  * reference algorithm (it mixes remaining bytes one at a time), so
  * string buckets would disagree with every real Iceberg writer. This
  * implementation reproduces all five of the spec's published test
  * vectors (int/long 34 → 2017239379, string "iceberg" → 1210000089,
  * date 2017-11-16 → -653330422, decimal 14.20 → -500754589,
  * timestamp 2017-11-16T22:31:08 → -2047944441), pinned in
  * IcebergTransformsSpec.
  */
object IcebergTransforms {

  /** murmur3_x86_32, seed 0, over `bytes`. */
  def murmur3(bytes: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h = 0
    val blocks = bytes.length / 4
    var i = 0
    while (i < blocks) {
      val o = i * 4
      var k = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
      k *= c1
      k = Integer.rotateLeft(k, 15)
      k *= c2
      h ^= k
      h = Integer.rotateLeft(h, 13)
      h = h * 5 + 0xe6546b64
      i += 1
    }
    var k = 0
    val tail = blocks * 4
    val rem = bytes.length - tail
    if (rem >= 3) k ^= (bytes(tail + 2) & 0xff) << 16
    if (rem >= 2) k ^= (bytes(tail + 1) & 0xff) << 8
    if (rem >= 1) {
      k ^= bytes(tail) & 0xff
      k *= c1
      k = Integer.rotateLeft(k, 15)
      k *= c2
      h ^= k
    }
    h ^= bytes.length
    h ^= h >>> 16
    h *= 0x85ebca6b
    h ^= h >>> 13
    h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  private def le8(v: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    b
  }

  /** Spec Appendix-B bucket of a long-backed value (int, long, date's
    * days, time/timestamp's micros — all hashed as 8-byte
    * little-endian).
    */
  def bucketLong(v: Long, n: Int): Int =
    ((murmur3(le8(v)) & Int.MaxValue) % n)

  /** Bucket of UTF-8 string bytes. */
  def bucketBytes(bytes: Array[Byte], n: Int): Int =
    ((murmur3(bytes) & Int.MaxValue) % n)

  /** Bucket of a decimal: minimal big-endian two's-complement of the
    * unscaled value.
    */
  def bucketDecimal(unscaled: java.math.BigInteger, n: Int): Int =
    bucketBytes(unscaled.toByteArray, n)

  private val EpochDate = java.time.LocalDate.of(1970, 1, 1)
  private val MicrosPerDay = 86400L * 1000000L
  private val MicrosPerHour = 3600L * 1000000L

  /** Day range [first, last] in epoch DAYS covered by an epoch-month
    * partition value.
    */
  def monthToDays(m: Int): (Long, Long) = {
    val start = EpochDate.plusMonths(m.toLong)
    (start.toEpochDay, start.plusMonths(1L).toEpochDay - 1)
  }

  /** Day range [first, last] in epoch DAYS covered by an epoch-year
    * partition value (years since 1970).
    */
  def yearToDays(y: Int): (Long, Long) = {
    val start = EpochDate.plusYears(y.toLong)
    (start.toEpochDay, start.plusYears(1L).toEpochDay - 1)
  }

  /** Micros range [first, last] covered by an epoch-day value. */
  def dayToMicros(d: Long): (Long, Long) =
    (d * MicrosPerDay, (d + 1) * MicrosPerDay - 1)

  /** Micros range [first, last] covered by an epoch-hour value. */
  def hourToMicros(h: Long): (Long, Long) =
    (h * MicrosPerHour, (h + 1) * MicrosPerHour - 1)
}
