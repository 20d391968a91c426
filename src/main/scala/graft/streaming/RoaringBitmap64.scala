package graft.streaming

import java.nio.{ByteBuffer, ByteOrder}

/** A 64-bit roaring bitmap in the "portable" serialization format the
  * open Delta protocol specifies for DELETION VECTORS (PROTOCOL.md,
  * "Deletion Vector Format"): a little-endian magic number, a count of
  * 32-bit roaring bitmaps, then each 32-bit bitmap in the standard
  * interoperable roaring format (github.com/RoaringBitmap/RoaringFormatSpec).
  * A 64-bit value v lives in bitmap `v >>> 32` at key `v & 0xFFFFFFFF`.
  *
  * Read side implements the FULL container set — array, bitmap, and run
  * containers, with and without the offset header — so foreign engines'
  * DVs (delta-spark, delta-rs both emit run containers after
  * optimization) deserialize exactly. Write side emits array containers
  * up to 4096 entries and bitmap containers above (a writer may choose
  * any valid container per the format spec; runs are an optimization,
  * never required).
  *
  * Scale note: a DV is per-FILE metadata bounded by the file's deleted-
  * row count (≤ rows-per-file bits) — the same driver-side volume every
  * Delta reader materializes to plan a merge-on-read scan.
  */
final class RoaringBitmap64 {
  // high-32 key -> sorted container of low-32 values; SortedMap keeps
  // serialization deterministic
  private val maps = scala.collection.mutable.SortedMap
    .empty[Int, scala.collection.mutable.SortedSet[Int]]

  def add(v: Long): Unit = {
    require(v >= 0, s"row index $v is negative")
    val hi = (v >>> 32).toInt
    val lo = (v & 0xFFFFFFFFL).toInt // kept as UNSIGNED bit pattern
    maps.getOrElseUpdate(hi,
      scala.collection.mutable.SortedSet.empty[Int](
        Ordering.by(Integer.toUnsignedLong))) += lo
  }

  def contains(v: Long): Boolean = {
    if (v < 0) return false
    maps.get((v >>> 32).toInt)
      .exists(_.contains((v & 0xFFFFFFFFL).toInt))
  }

  def cardinality: Long = maps.valuesIterator.map(_.size.toLong).sum

  def values: Seq[Long] = maps.toSeq.flatMap { case (hi, set) =>
    set.toSeq.map(lo => (hi.toLong << 32) | Integer.toUnsignedLong(lo))
  }

  /** Portable bytes: magic, then the RoaringFormatSpec 64-bit layout —
    * an 8-byte bitmap count followed by (4-byte high key + 32-bit
    * bitmap) pairs, everything little-endian.
    */
  def serialize(): Array[Byte] = {
    val parts = maps.toSeq.map { case (hi, set) =>
      hi -> serialize32(set.toIndexedSeq)
    }
    val body = new java.io.ByteArrayOutputStream()
    val head = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    head.putInt(RoaringBitmap64.Magic).putLong(parts.size.toLong)
    body.write(head.array())
    parts.foreach { case (hi, bytes) =>
      val k = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      k.putInt(hi)
      body.write(k.array())
      body.write(bytes)
    }
    body.toByteArray
  }

  /** One 32-bit roaring bitmap, portable format, little-endian. */
  private def serialize32(sorted: IndexedSeq[Int]): Array[Byte] = {
    // group into 16-bit-key containers, preserving unsigned order
    val containers = scala.collection.mutable.LinkedHashMap
      .empty[Int, scala.collection.mutable.ArrayBuffer[Int]]
    sorted.foreach { v =>
      val key = v >>> 16
      containers.getOrElseUpdate(key,
        scala.collection.mutable.ArrayBuffer.empty[Int]) += (v & 0xFFFF)
    }
    val n = containers.size
    val out = new java.io.ByteArrayOutputStream()
    def le(bytes: Int)(fill: ByteBuffer => Unit): Unit = {
      val b = ByteBuffer.allocate(bytes).order(ByteOrder.LITTLE_ENDIAN)
      fill(b); out.write(b.array())
    }
    le(8) { b =>
      b.putInt(RoaringBitmap64.CookieNoRun).putInt(n)
    }
    containers.foreach { case (key, vals) =>
      le(4)(b => b.putShort(key.toShort)
        .putShort((vals.length - 1).toShort))
    }
    // offset header (mandatory in the no-run layout)
    var pos = 8 + 4 * n + 4 * n
    containers.foreach { case (_, vals) =>
      le(4)(_.putInt(pos))
      pos += (if (vals.length <= 4096) 2 * vals.length else 8192)
    }
    containers.foreach { case (_, vals) =>
      if (vals.length <= 4096)
        le(2 * vals.length)(b => vals.foreach(v => b.putShort(v.toShort)))
      else {
        val words = new Array[Long](1024)
        vals.foreach(v => words(v >>> 6) |= (1L << (v & 63)))
        le(8192)(b => words.foreach(b.putLong))
      }
    }
    out.toByteArray
  }
}

object RoaringBitmap64 {
  /** Magic of the 64-bit portable wrapper (the Delta protocol's DV
    * serialization format id 1 payload).
    */
  private[streaming] val Magic = 1681511377
  private val CookieNoRun = 12346
  private val CookieRun = 12347
  private val NoOffsetThreshold = 4

  def apply(vs: Iterable[Long]): RoaringBitmap64 = {
    val r = new RoaringBitmap64
    vs.foreach(r.add)
    r
  }

  /** Deserialize the portable 64-bit format — full container coverage
    * (array, bitmap, run; with or without offset headers).
    */
  def deserialize(bytes: Array[Byte]): RoaringBitmap64 = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = b.getInt
    require(magic == Magic,
      s"deletion-vector bitmap magic $magic != $Magic — not the " +
        "portable RoaringBitmapArray format")
    val n = b.getLong
    require(n >= 0 && n <= Int.MaxValue, s"absurd bitmap count $n")
    val r = new RoaringBitmap64
    (0L until n).foreach { _ =>
      val hi = b.getInt
      read32(b, hi, r)
    }
    r
  }

  /** One 32-bit roaring bitmap from the buffer's current position, per
    * the interoperable spec: cookie (+run bitset), descriptive headers,
    * optional offset header, containers in key order.
    */
  private def read32(b: ByteBuffer, hi: Int, r: RoaringBitmap64): Unit = {
    val cookie = b.getInt
    val hasRun = (cookie & 0xFFFF) == CookieRun
    val n =
      if (hasRun) (cookie >>> 16) + 1
      else {
        require(cookie == CookieNoRun,
          s"roaring cookie $cookie is neither $CookieNoRun nor $CookieRun")
        b.getInt
      }
    val runFlags: Array[Boolean] =
      if (!hasRun) new Array[Boolean](n)
      else {
        val bits = new Array[Byte]((n + 7) / 8)
        b.get(bits)
        Array.tabulate(n)(i => (bits(i / 8) & (1 << (i % 8))) != 0)
      }
    val keys = new Array[Int](n)
    val cards = new Array[Int](n)
    (0 until n).foreach { i =>
      keys(i) = b.getShort & 0xFFFF
      cards(i) = (b.getShort & 0xFFFF) + 1
    }
    if (!hasRun || n >= NoOffsetThreshold) b.position(b.position() + 4 * n)
    (0 until n).foreach { i =>
      val base = (hi.toLong << 32) | (keys(i).toLong << 16)
      if (runFlags(i)) {
        val runs = b.getShort & 0xFFFF
        (0 until runs).foreach { _ =>
          val start = b.getShort & 0xFFFF
          val len = b.getShort & 0xFFFF
          (start to start + len).foreach(v => r.add(base | v))
        }
      } else if (cards(i) <= 4096) {
        (0 until cards(i)).foreach(_ => r.add(base | (b.getShort & 0xFFFF)))
      } else {
        (0 until 1024).foreach { w =>
          var word = b.getLong
          var bit = 0
          while (word != 0L) {
            val tz = java.lang.Long.numberOfTrailingZeros(word)
            bit += tz
            r.add(base | (w * 64 + bit))
            word = word >>> tz >>> 1
            bit += 1
          }
        }
      }
    }
  }
}

/** Base85 with the RFC 1924 character set and 4-byte block alignment —
  * what the open Delta protocol specifies for encoding DV file-name
  * UUIDs and inline deletion vectors (PROTOCOL.md, "Deletion Vector
  * Descriptor Schema").
  */
object Base85 {
  private val Alphabet = ("0123456789" +
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ" + "abcdefghijklmnopqrstuvwxyz" +
    "!#$%&()*+-;<=>?@^_`{|}~").toCharArray
  require(Alphabet.length == 85)
  private val Decode: Array[Int] = {
    val d = Array.fill(128)(-1)
    Alphabet.zipWithIndex.foreach { case (c, i) => d(c.toInt) = i }
    d
  }

  /** Encode; input length must be a multiple of 4 (the protocol only
    * encodes UUIDs (16 bytes) and 4-byte-aligned inline DV payloads).
    */
  def encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0,
      s"base85 payload of ${bytes.length} bytes is not 4-byte aligned")
    val b = ByteBuffer.wrap(bytes)
    val sb = new java.lang.StringBuilder(bytes.length / 4 * 5)
    while (b.hasRemaining) {
      var block = Integer.toUnsignedLong(b.getInt)
      val chunk = new Array[Char](5)
      var i = 4
      while (i >= 0) {
        chunk(i) = Alphabet((block % 85).toInt)
        block /= 85
        i -= 1
      }
      sb.append(chunk)
    }
    sb.toString
  }

  def decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0,
      s"base85 string of ${s.length} chars is not 5-char aligned")
    val out = ByteBuffer.allocate(s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var block = 0L
      (0 until 5).foreach { j =>
        val c = s.charAt(i + j)
        val v = if (c < 128) Decode(c.toInt) else -1
        require(v >= 0, s"'$c' is not a base85 (RFC 1924) character")
        block = block * 85 + v
      }
      require(block <= 0xFFFFFFFFL,
        s"base85 block '${s.substring(i, i + 5)}' overflows 32 bits")
      out.putInt(block.toInt)
      i += 5
    }
    out.array()
  }

  def encodeUuid(u: java.util.UUID): String = {
    val b = ByteBuffer.allocate(16)
    b.putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits)
    encode(b.array())
  }

  def decodeUuid(s: String): java.util.UUID = {
    require(s.length == 20, s"encoded UUID must be 20 chars, got ${s.length}")
    val b = ByteBuffer.wrap(decode(s))
    new java.util.UUID(b.getLong, b.getLong)
  }
}
