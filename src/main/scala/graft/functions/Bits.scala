package graft.functions

/** Minimal big-endian bit stream primitives shared by the codecs.
 * Each encoded blob is fully self-contained (header + payload) — the
 * engine never splits a bit stream across rows, per the reference's
 * series-boundary rule (uni2ts/src/uni2ts/transform/precondition.py:176-185)
 * and its decode-needs-full-history lesson (reference CLAUDE.md:24-88). */
final class BitWriter(initialCapacity: Int = 64) {
  private var buf = new Array[Byte](math.max(8, initialCapacity))
  private var bitPos = 0 // next free bit index

  private def ensure(bits: Int): Unit = {
    val needBytes = (bitPos + bits + 7) >>> 3
    if (needBytes > buf.length) {
      var n = buf.length * 2
      while (n < needBytes) n *= 2
      buf = java.util.Arrays.copyOf(buf, n)
    }
  }

  /** Write the low `n` bits of `v` (0 <= n <= 64), most-significant first. */
  def writeBits(v: Long, n: Int): Unit = {
    ensure(n)
    var i = n - 1
    while (i >= 0) {
      if (((v >>> i) & 1L) != 0L)
        buf((bitPos >>> 3)) = (buf(bitPos >>> 3) | (0x80 >>> (bitPos & 7))).toByte
      bitPos += 1
      i -= 1
    }
  }

  def writeBit(b: Boolean): Unit = writeBits(if (b) 1L else 0L, 1)

  def toBytes: Array[Byte] = java.util.Arrays.copyOf(buf, (bitPos + 7) >>> 3)
}

final class BitReader(bytes: Array[Byte]) {
  private var bitPos = 0

  /** Read `n` bits (0 <= n <= 64), most-significant first. */
  def readBits(n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) {
      v = (v << 1) | ((bytes(bitPos >>> 3) >>> (7 - (bitPos & 7))) & 1L)
      bitPos += 1
      i += 1
    }
    v
  }

  def readBit(): Boolean = readBits(1) == 1L
}
