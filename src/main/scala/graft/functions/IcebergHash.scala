package graft.functions

import java.nio.charset.StandardCharsets.UTF_8

/** 32-bit Murmur3 (x86 variant, seed 0) with Iceberg's per-type byte
  * encodings, per the public Iceberg table spec "Appendix B: 32-bit Hash
  * Requirements":
  *  - int/long/date/time/timestamp hash the 8-byte little-endian long
  *  - string hashes the UTF-8 bytes
  *  - decimal hashes the minimal two's-complement big-endian unscaled value
  *
  * The algorithm itself is Austin Appleby's public-domain MurmurHash3.
  * Needed because Spark's built-in `hash()` uses its own element encoding
  * and seed 42, which would not reproduce Iceberg bucket assignments
  * (SURVEY §2.8 T7).
  */
object IcebergHash {

  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    var x = v
    while (i < 8) { b(i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
    murmur3(b, 0)
  }

  def hashInt(v: Int): Int = hashLong(v.toLong)

  def hashString(s: String): Int = murmur3(s.getBytes(UTF_8), 0)

  def hashBytes(b: Array[Byte]): Int = murmur3(b, 0)

  def hashDecimal(d: java.math.BigDecimal): Int =
    murmur3(d.unscaledValue().toByteArray, 0)

  /** Standard MurmurHash3 x86_32. */
  def murmur3(data: Array[Byte], seed: Int): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = seed
    val len = data.length
    val nblocks = len / 4

    var i = 0
    while (i < nblocks) {
      val base = i * 4
      var k1 = (data(base) & 0xff) |
        ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) |
        ((data(base + 3) & 0xff) << 24)
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }

    var k1 = 0
    val tail = nblocks * 4
    (len & 3) match {
      case 3 =>
        k1 ^= (data(tail + 2) & 0xff) << 16
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 2 =>
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 1 =>
        k1 ^= data(tail) & 0xff
      case _ =>
    }
    if ((len & 3) != 0) {
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
    }

    h1 ^= len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }
}
