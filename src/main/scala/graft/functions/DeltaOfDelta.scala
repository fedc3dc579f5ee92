package graft.functions

/**
 * Delta-of-delta timestamp compression (Gorilla paper §4.1.1, Pelkonen et
 * al. VLDB 2015 — public specification), generalized to arbitrary int64
 * timestamps (microsecond precision included).
 *
 * Stream layout (self-contained per blob):
 *   [int32 count][first ts: 64 raw bits][per ts: control + payload]
 * For each subsequent timestamp, D = (t_i - t_{i-1}) - (t_{i-1} - t_{i-2})
 * (for i == 1 the previous delta is defined as 0):
 *   '0'     — D == 0
 *   '10'    — D in [-63, 64]        : 7 bits  (D + 63)
 *   '110'   — D in [-4095, 4096]    : 13 bits (D + 4095)
 *   '1110'  — D in [-(2^31), 2^31-1]: 32 bits (two's complement low bits)
 *   '1111'  — full 64-bit D
 *
 * Contract: exact round-trip for any Long sequence whose consecutive deltas
 * and delta-of-deltas do not overflow Long (always true for monotone
 * epoch-microsecond spines).
 */
object DeltaOfDelta {

  def encode(ts: Array[Long]): Array[Byte] = {
    val w = new BitWriter(8 + ts.length)
    w.writeBits(ts.length.toLong, 32)
    if (ts.isEmpty) return w.toBytes
    w.writeBits(ts(0), 64)
    var prevTs = ts(0)
    var prevDelta = 0L
    var i = 1
    while (i < ts.length) {
      val delta = ts(i) - prevTs
      val d = delta - prevDelta
      if (d == 0L) w.writeBit(false)
      else if (d >= -63L && d <= 64L) {
        w.writeBits(2L, 2) // '10'
        w.writeBits(d + 63L, 7)
      } else if (d >= -4095L && d <= 4096L) {
        w.writeBits(6L, 3) // '110'
        w.writeBits(d + 4095L, 13)
      } else if (d >= Int.MinValue.toLong && d <= Int.MaxValue.toLong) {
        w.writeBits(14L, 4) // '1110'
        w.writeBits(d & 0xffffffffL, 32)
      } else {
        w.writeBits(15L, 4) // '1111'
        w.writeBits(d, 64)
      }
      prevDelta = delta
      prevTs = ts(i)
      i += 1
    }
    w.toBytes
  }

  def decode(bytes: Array[Byte]): Array[Long] = {
    val r = new BitReader(bytes)
    val n = r.readBits(32).toInt
    val out = new Array[Long](n)
    if (n == 0) return out
    var prevTs = r.readBits(64)
    out(0) = prevTs
    var prevDelta = 0L
    var i = 1
    while (i < n) {
      val d: Long =
        if (!r.readBit()) 0L
        else if (!r.readBit()) r.readBits(7) - 63L
        else if (!r.readBit()) r.readBits(13) - 4095L
        else if (!r.readBit()) r.readBits(32).toInt.toLong // sign-extend
        else r.readBits(64)
      val delta = prevDelta + d
      prevTs += delta
      out(i) = prevTs
      prevDelta = delta
      i += 1
    }
    out
  }
}
