package graft.streaming

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

/** The DV bitmap + base85 codecs are pure — no Spark session needed. */
class RoaringBitmap64Spec extends AnyFunSuite {

  test("serialize/deserialize round-trips array, bitmap, and >2^32 keys") {
    val vals: Seq[Long] =
      Seq(0L, 1L, 5L, 4096L, 65535L, 65536L, 1000000L) ++ // array containers
      (0L until 5000L).map(_ * 2 + 131072L) ++ // a 5000-card bitmap container
      Seq((1L << 32) + 7L, (5L << 32) + 123456L) // multiple high keys
    val bm = RoaringBitmap64(vals)
    assert(bm.cardinality == vals.distinct.size)
    val back = RoaringBitmap64.deserialize(bm.serialize())
    assert(back.values == vals.distinct.sorted)
    assert(vals.forall(back.contains))
    assert(!back.contains(2L) && !back.contains((2L << 32) + 1))
  }

  test("empty and single-value bitmaps survive; negatives never match") {
    assert(RoaringBitmap64.deserialize(
      RoaringBitmap64(Nil).serialize()).cardinality == 0)
    val one = RoaringBitmap64.deserialize(RoaringBitmap64(Seq(42L)).serialize())
    assert(one.values == Seq(42L) && !one.contains(-1L))
  }

  test("reads the RUN-container format foreign writers emit after " +
      "optimization (we never write runs; we must read them)") {
    // hand-build one 32-bit bitmap with two run containers, per the
    // interoperable spec: cookie 12347 | (n-1)<<16, run bitset, headers,
    // NO offset header (n < 4), then runs
    val b = ByteBuffer.allocate(1024).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(RoaringBitmap64.Magic) // 64-bit wrapper magic
    b.putLong(1L) // one 32-bit bitmap
    b.putInt(0) // its high-32 key
    b.putInt(12347 | ((2 - 1) << 16)) // run cookie, 2 containers
    b.put(0x3.toByte) // both containers are runs
    b.putShort(0.toShort); b.putShort((8 - 1).toShort) // key 0, card 8
    b.putShort(1.toShort); b.putShort((3 - 1).toShort) // key 1, card 3
    b.putShort(2.toShort) // container 0: two runs
    b.putShort(10.toShort); b.putShort(4.toShort) // 10..14 (5 values)
    b.putShort(100.toShort); b.putShort(2.toShort) // 100..102 (3 values)
    b.putShort(1.toShort) // container 1: one run
    b.putShort(7.toShort); b.putShort(2.toShort) // 7..9 (3 values)
    val bytes = java.util.Arrays.copyOf(b.array(), b.position())
    val bm = RoaringBitmap64.deserialize(bytes)
    assert(bm.values == (Seq(10L, 11L, 12L, 13L, 14L, 100L, 101L, 102L) ++
      Seq(65536L + 7, 65536L + 8, 65536L + 9)))
  }

  test("base85 (RFC 1924): 4-byte blocks round-trip; UUIDs encode to 20 " +
      "chars; bad chars and misaligned input refuse") {
    val data = Array[Byte](0, 1, 2, 3, -1, -2, -3, -4)
    assert(Base85.decode(Base85.encode(data)).toSeq == data.toSeq)
    val u = java.util.UUID.fromString("01234567-89ab-cdef-0123-456789abcdef")
    val enc = Base85.encodeUuid(u)
    assert(enc.length == 20 && Base85.decodeUuid(enc) == u)
    intercept[IllegalArgumentException](Base85.decode("abcd")) // not %5
    intercept[IllegalArgumentException](Base85.decode("ab de")) // bad char
    intercept[IllegalArgumentException](Base85.encode(Array[Byte](1, 2)))
  }
}
