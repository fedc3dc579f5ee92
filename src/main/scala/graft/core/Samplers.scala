package graft.core

/**
 * Deterministic sampler registry — the engine's analogue of the
 * reference's `Sampler = Callable[[int], int]` family
 * (uni2ts/src/uni2ts/common/sampler.py:20-55: uniform, binomial,
 * beta-binomial over [1, n]). The reference draws from np.random; this
 * engine replaces the global RNG with an explicit 64-bit seed so every
 * draw is a pure function of (seed, n) — reproducible at any parallelism,
 * the same substitution made for crops, pads and weights throughout.
 *
 * Streams use the SplitMix64 finalizer (public constants, Steele/Lea/
 * Flood 2014); Beta draws use Johnk's algorithm over the deterministic
 * uniform stream (rejection consumes stream positions deterministically).
 */
object Samplers {

  type Sampler = (Long, Int) => Int

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** k-th uniform double in [0, 1) of the seed's stream. */
  private def u01(seed: Long, k: Long): Double =
    (mix64(seed + k) >>> 11) * 1.1102230246251565e-16 // 2^-53

  /** uniform_sampler: uniform over [1, n]. */
  def uniform(seed: Long, n: Int): Int = {
    require(n >= 1)
    (java.lang.Long.remainderUnsigned(mix64(seed), n) + 1).toInt
  }

  /** binomial_sampler: Binomial(n-1, p) + 1 — n-1 Bernoulli draws from the
   * stream (patch counts are small; O(n) is fine and exact). */
  def binomial(seed: Long, n: Int, p: Double = 0.5): Int = {
    require(n >= 1)
    var s = 0
    var i = 0
    while (i < n - 1) {
      if (u01(seed, i) < p) s += 1
      i += 1
    }
    s + 1
  }

  /** beta_binomial_sampler: p ~ Beta(a, b) via Johnk (deterministic
   * rejection over the stream), then Binomial(n-1, p) + 1; a=b=1 reduces
   * to the uniform sampler's distribution. */
  def betaBinomial(seed: Long, n: Int, a: Double = 1, b: Double = 1): Int = {
    require(n >= 1 && a > 0 && b > 0)
    var k = 1L << 32 // beta stream offset, disjoint from the binomial draws
    var p = -1.0
    while (p < 0) {
      val x = math.pow(u01(seed, k), 1.0 / a)
      val y = math.pow(u01(seed, k + 1), 1.0 / b)
      if (x + y <= 1.0 && x + y > 0) p = x / (x + y)
      k += 2
    }
    var s = 0
    var i = 0
    while (i < n - 1) {
      if (u01(seed, i) < p) s += 1
      i += 1
    }
    s + 1
  }

  /** get_sampler (sampler.py:45-55). */
  def get(distribution: String): Sampler = distribution match {
    case "uniform" => uniform(_, _)
    case "binomial" => binomial(_, _, 0.5)
    case "beta_binomial" => betaBinomial(_, _, 1, 1)
    case other => throw new IllegalArgumentException(s"unknown sampler: $other")
  }
}
