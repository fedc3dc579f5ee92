package graft.core

/** Shared 64-bit mixing primitive: the SplitMix64 finalizer (public
 * constants — Steele/Lea/Flood 2014; Vigna). Single definition used by
 * both the MinHash permutation family (operators/Dedup) and the sampler
 * streams (core/Samplers) so the two can never silently diverge. */
object Hash {
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
