package graft.core

/**
 * Patch-size constraint resolution — the engine's analogue of the
 * reference's GetPatchSize / PatchSizeConstraints system
 * (uni2ts/src/uni2ts/transform/patch.py:33-120): the legal bucket width for
 * a series is the intersection of
 *
 *   1. a frequency-dependent legal range (the reference's DEFAULT_RANGES
 *      table, patch.py:59-70),
 *   2. the configured candidate set (default {8,16,32,64,128}),
 *   3. a length ceiling `length / minTimePatches` guaranteeing at least
 *      `minTimePatches` patches per series.
 *
 * The reference picks randomly among survivors (np.random.choice,
 * patch.py:117) — a training-augmentation concern; this engine is
 * deterministic, so [[resolve]] picks the LARGEST survivor (widest bucket
 * = fewest groups = cheapest rollup), and callers needing the full set use
 * [[candidates]]. Resolution failure is an error carrying the same
 * diagnostic fields as the reference's AssertionError (patch.py:106-115).
 */
object PatchSizing {

  /** Frequency alias -> inclusive (start, stop) legal patch-size range. */
  val DefaultRanges: Map[String, (Int, Int)] = Map(
    "S" -> (64, 128),
    "T" -> (32, 128),
    "H" -> (32, 64),
    "D" -> (16, 32),
    "B" -> (16, 32),
    "W" -> (16, 32),
    "M" -> (8, 32),
    "Q" -> (1, 8),
    "Y" -> (1, 8),
    "A" -> (1, 8))

  val DefaultCandidates: Seq[Int] = Seq(8, 16, 32, 64, 128)

  /** Fixed-range constraint (FixedPatchSizeConstraints, patch.py:44-55). */
  def fixedRange(start: Int, stop: Int): (Int, Int) = {
    require(start <= stop, s"fixed range start $start > stop $stop")
    (start, stop)
  }

  def legalRange(freq: String): (Int, Int) =
    DefaultRanges.getOrElse(
      freq,
      throw new IllegalArgumentException(s"unknown freq alias: $freq"))

  /** All legal candidates for (freq, series length, minTimePatches). */
  def candidates(
      freq: String,
      length: Int,
      minTimePatches: Int,
      candidateSet: Seq[Int] = DefaultCandidates): Seq[Int] = {
    val (lo, hi) = legalRange(freq)
    val ceil = length / minTimePatches
    candidateSet.filter(p => p >= lo && p <= hi && p <= ceil)
  }

  /** Deterministic resolution: the largest legal candidate. */
  def resolve(
      freq: String,
      length: Int,
      minTimePatches: Int,
      candidateSet: Seq[Int] = DefaultCandidates): Int = {
    val cs = candidates(freq, length, minTimePatches, candidateSet)
    if (cs.isEmpty)
      throw new IllegalArgumentException(
        s"no valid patch size: freq=$freq, length=$length, " +
          s"minTimePatches=$minTimePatches, candidates=$candidateSet, " +
          s"constraints=${legalRange(freq)}, ceil=${length / minTimePatches}")
    cs.max
  }
}
