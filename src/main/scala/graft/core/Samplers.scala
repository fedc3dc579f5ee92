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
 * Stream discipline: position k of seed s draws from
 * `mix64(mix64(s) ^ k)` — seed and position are NOT interchangeable, so
 * adjacent seeds (the natural per-item keying, e.g. seed = doc_id) get
 * fully decorrelated sequences rather than sliding windows of one shared
 * Bernoulli stream. Beta draws use Johnk's algorithm for small shapes and
 * Marsaglia-Tsang gamma ratios for larger ones (both public algorithms;
 * rejection consumes stream positions deterministically).
 */
object Samplers {

  type Sampler = (Long, Int) => Int

  import Hash.mix64

  private val Inv53 = 1.0 / (1L << 53)

  /** k-th uniform double in (0, 1] of the seed's stream (log() is safe). */
  private def u01(seed: Long, k: Long): Double =
    ((mix64(mix64(seed) ^ k) >>> 11) + 1L) * Inv53

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

  private val BetaStreamBase = 1L << 32 // disjoint from the Bernoulli draws

  /** Standard normal via Box-Muller over two stream draws. */
  private def gauss(seed: Long, k: Long): Double =
    math.sqrt(-2.0 * math.log(u01(seed, k))) *
      math.cos(2.0 * math.Pi * u01(seed, k + 1))

  /** Gamma(shape >= 1) via Marsaglia-Tsang (2000); returns the draw and
   * the next unused stream position. */
  private def gammaMT(seed: Long, k0: Long, shape: Double): (Double, Long) = {
    val d = shape - 1.0 / 3.0
    val c = 1.0 / math.sqrt(9.0 * d)
    var k = k0
    while (true) {
      val x = gauss(seed, k)
      val u = u01(seed, k + 2)
      k += 3
      val t = 1.0 + c * x
      if (t > 0) {
        val v = t * t * t
        if (math.log(u) < 0.5 * x * x + d - d * v + d * math.log(v))
          return (d * v, k)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Gamma(any shape > 0): Marsaglia-Tsang with the shape<1 boost
   * Gamma(a) = Gamma(a+1) * U^(1/a). */
  private def gamma(seed: Long, k0: Long, shape: Double): (Double, Long) =
    if (shape >= 1.0) gammaMT(seed, k0, shape)
    else {
      val (g, k) = gammaMT(seed, k0, shape + 1.0)
      (g * math.pow(u01(seed, k), 1.0 / shape), k + 1)
    }

  /** beta_binomial_sampler: p ~ Beta(a, b), then Binomial(n-1, p) + 1;
   * a=b=1 reduces to the uniform sampler's distribution. Johnk for small
   * shapes (acceptance is high there), gamma ratio X/(X+Y) otherwise
   * (Johnk's acceptance probability collapses for large a+b). */
  def betaBinomial(seed: Long, n: Int, a: Double = 1, b: Double = 1): Int = {
    require(n >= 1 && a > 0 && b > 0)
    val p =
      if (a <= 1.0 && b <= 1.0) {
        var k = BetaStreamBase
        var out = -1.0
        while (out < 0) {
          val x = math.pow(u01(seed, k), 1.0 / a)
          val y = math.pow(u01(seed, k + 1), 1.0 / b)
          if (x + y <= 1.0 && x + y > 0) out = x / (x + y)
          k += 2
        }
        out
      } else {
        val (x, k1) = gamma(seed, BetaStreamBase, a)
        val (y, _) = gamma(seed, k1, b)
        x / (x + y)
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
