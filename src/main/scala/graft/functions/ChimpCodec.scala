package graft.functions

/**
 * Chimp lossless float compression (Liakos, Papakonstantinopoulou &
 * Kotidis, "Chimp: Efficient Lossless Floating Point Compression for Time
 * Series Databases", PVLDB 15(11), 2022 — public specification; listed in
 * PAPERS.md). Chimp improves on Gorilla's XOR scheme with a 2-bit flag per
 * value, a rounded 3-bit leading-zero code, and trailing-zero encoding
 * only when it pays (> 6 trailing zeros).
 *
 * Stream layout (self-contained per blob, same framing discipline as
 * GorillaCodec):
 *   [int32 count][first value: 64 raw bits][per value: 2-bit flag + payload]
 * Flags for xor = bits(v) ^ bits(prev):
 *   '00' — xor == 0
 *   '01' — trailing zeros > 6: 3-bit leading code, 6-bit significant-bit
 *          count, then the center bits (xor >>> trailing)
 *   '10' — reuse the previous leading-zero count: (64 - lead) low bits
 *   '11' — new leading-zero count: 3-bit leading code + (64 - lead) bits
 *
 * Values are RAW IEEE-754 bit patterns — NaN payloads, ±0.0 and denormals
 * round-trip bit-exactly (ScalaCheck property in CodecSpec).
 */
object ChimpCodec {

  /** Leading-zero counts rounded DOWN to these thresholds (the paper's
   * 3-bit leadingRepresentation table). */
  private val LeadingRound: Array[Int] =
    Array(0, 8, 12, 16, 18, 20, 22, 24)

  /** LZC -> 3-bit code (index of the rounded threshold). */
  private def leadingCode(lzc: Int): Int = {
    var i = LeadingRound.length - 1
    while (LeadingRound(i) > lzc) i -= 1
    i
  }

  def encode(values: Array[Double]): Array[Byte] = {
    val w = new BitWriter(8 + values.length)
    w.writeBits(values.length.toLong, 32)
    if (values.isEmpty) return w.toBytes
    var prev = java.lang.Double.doubleToRawLongBits(values(0))
    w.writeBits(prev, 64)
    var storedLead = -1 // -1 = no reusable leading count
    var i = 1
    while (i < values.length) {
      val cur = java.lang.Double.doubleToRawLongBits(values(i))
      val xor = cur ^ prev
      if (xor == 0L) {
        w.writeBits(0L, 2) // '00'
        storedLead = -1
      } else {
        val code = leadingCode(java.lang.Long.numberOfLeadingZeros(xor))
        val lead = LeadingRound(code)
        val trail = java.lang.Long.numberOfTrailingZeros(xor)
        if (trail > 6) {
          val sig = 64 - lead - trail
          w.writeBits(1L, 2) // '01'
          w.writeBits(code.toLong, 3)
          w.writeBits(sig.toLong, 6)
          w.writeBits(xor >>> trail, sig)
          storedLead = -1
        } else if (lead == storedLead) {
          w.writeBits(2L, 2) // '10'
          w.writeBits(xor, 64 - lead)
        } else {
          storedLead = lead
          w.writeBits(3L, 2) // '11'
          w.writeBits(code.toLong, 3)
          w.writeBits(xor, 64 - lead)
        }
      }
      prev = cur
      i += 1
    }
    w.toBytes
  }

  def decode(bytes: Array[Byte]): Array[Double] = {
    val r = new BitReader(bytes)
    val n = r.readBits(32).toInt
    val out = new Array[Double](n)
    if (n == 0) return out
    var prev = r.readBits(64)
    out(0) = java.lang.Double.longBitsToDouble(prev)
    var storedLead = -1
    var i = 1
    while (i < n) {
      val flag = r.readBits(2).toInt
      val xor = flag match {
        case 0 =>
          storedLead = -1
          0L
        case 1 =>
          val lead = LeadingRound(r.readBits(3).toInt)
          val sig = r.readBits(6).toInt
          val trail = 64 - lead - sig
          storedLead = -1
          r.readBits(sig) << trail
        case 2 =>
          r.readBits(64 - storedLead)
        case _ =>
          storedLead = LeadingRound(r.readBits(3).toInt)
          r.readBits(64 - storedLead)
      }
      prev = prev ^ xor
      out(i) = java.lang.Double.longBitsToDouble(prev)
      i += 1
    }
    out
  }
}
