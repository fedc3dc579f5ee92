package graft.functions

/**
 * Gorilla XOR float compression (Pelkonen et al., "Gorilla: A Fast,
 * Scalable, In-Memory Time Series Database", VLDB 2015, §4.1.2 — public
 * specification; no reference code involved).
 *
 * Stream layout (self-contained per blob):
 *   [int32 count][first value: 64 raw bits][per value: control + payload]
 * Control bits per subsequent value v, with xor = bits(v) ^ bits(prev):
 *   '0'            — xor == 0 (identical value)
 *   '10'           — xor fits the previous (leading, meaningful) window:
 *                    write the same number of meaningful bits
 *   '11'           — new window: 5 bits leading-zero count (capped 31),
 *                    6 bits (meaningful-length - 1), then the bits
 *
 * Values are handled as RAW IEEE-754 bit patterns (doubleToRawLongBits), so
 * NaN payloads, ±0.0 and denormals all round-trip bit-exactly — the
 * engine's descendant of the reference's forward/reverse invertibility
 * contract (test_forward_reverse_correctness.py:38-54), strengthened from
 * max-err<1e-10 to exact equality because the codec is lossless.
 */
object GorillaCodec {

  def encode(values: Array[Double]): Array[Byte] = {
    val w = new BitWriter(8 + values.length) // rough initial guess
    w.writeBits(values.length.toLong, 32)
    if (values.isEmpty) return w.toBytes
    var prev = java.lang.Double.doubleToRawLongBits(values(0))
    w.writeBits(prev, 64)
    var prevLead = -1
    var prevMean = -1 // meaningful-bit count of the previous window
    var i = 1
    while (i < values.length) {
      val cur = java.lang.Double.doubleToRawLongBits(values(i))
      val xor = cur ^ prev
      if (xor == 0L) {
        w.writeBit(false)
      } else {
        w.writeBit(true)
        val lead0 = java.lang.Long.numberOfLeadingZeros(xor)
        val lead = if (lead0 > 31) 31 else lead0
        val trail = java.lang.Long.numberOfTrailingZeros(xor)
        val mean = 64 - lead - trail
        if (prevLead >= 0 && lead >= prevLead && (64 - prevLead - prevMean) <= trail) {
          // reuse previous window
          w.writeBit(false)
          w.writeBits(xor >>> (64 - prevLead - prevMean), prevMean)
        } else {
          w.writeBit(true)
          w.writeBits(lead.toLong, 5)
          w.writeBits((mean - 1).toLong, 6)
          w.writeBits(xor >>> trail, mean)
          prevLead = lead
          prevMean = mean
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
    var lead = 0
    var mean = 0
    var i = 1
    while (i < n) {
      if (!r.readBit()) {
        // identical
      } else if (!r.readBit()) {
        val bits = r.readBits(mean)
        prev = prev ^ (bits << (64 - lead - mean))
      } else {
        lead = r.readBits(5).toInt
        mean = r.readBits(6).toInt + 1
        val bits = r.readBits(mean)
        prev = prev ^ (bits << (64 - lead - mean))
      }
      out(i) = java.lang.Double.longBitsToDouble(prev)
      i += 1
    }
    out
  }
}
