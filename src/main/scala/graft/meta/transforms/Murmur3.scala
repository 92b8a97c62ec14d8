package graft.meta.transforms

/** Murmur3 x86 32-bit, seed 0 — the hash the reference's bucket transform uses
  * (via Guava `Hashing.murmur3_32()`; ref `api/.../transforms/Bucket.java:44`).
  * Byte-exactness matters: the bucket id decides file routing and partition
  * pruning, so any deviation silently breaks pruning vs written layout.
  */
object Murmur3 {
  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  def hashBytes(data: Array[Byte]): Int = hashBytes(data, 0, data.length)

  def hashBytes(data: Array[Byte], offset: Int, len: Int): Int = {
    var h1 = 0 // seed
    val nblocks = len / 4
    var i = 0
    while (i < nblocks) {
      val base = offset + i * 4
      var k1 = (data(base) & 0xff) |
        ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) |
        ((data(base + 3) & 0xff) << 24)
      k1 *= C1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= C2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    var k1 = 0
    val tail = offset + nblocks * 4
    val rem = len & 3
    if (rem == 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if (rem >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if (rem >= 1) {
      k1 ^= data(tail) & 0xff
      k1 *= C1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= C2
      h1 ^= k1
    }
    fmix(h1 ^ len)
  }

  /** Hash of the 8 little-endian bytes of `v` (Guava `hashLong` semantics). */
  def hashLong(v: Long): Int = {
    var h1 = 0
    var k1 = (v & 0xffffffffL).toInt
    k1 *= C1
    k1 = Integer.rotateLeft(k1, 15)
    k1 *= C2
    h1 ^= k1
    h1 = Integer.rotateLeft(h1, 13)
    h1 = h1 * 5 + 0xe6546b64
    k1 = (v >>> 32).toInt
    k1 *= C1
    k1 = Integer.rotateLeft(k1, 15)
    k1 *= C2
    h1 ^= k1
    h1 = Integer.rotateLeft(h1, 13)
    h1 = h1 * 5 + 0xe6546b64
    fmix(h1 ^ 8)
  }

  private def fmix(h: Int): Int = {
    var h1 = h
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }
}
