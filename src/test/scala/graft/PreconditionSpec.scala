package graft

import graft.functions.Precondition
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Descendant of the reference's coefficient + forward/reverse suites
 * (test_chebyshev_coefficients.py, test_forward_reverse_correctness.py). */
class PreconditionSpec extends AnyFunSuite {

  test("chebyshev monic coefficients match hand-derived values") {
    // T2 = 2x^2 - 1, monic x^2 - 1/2         -> [c1, c2] = [0, -0.5]
    assert(Precondition.chebyshevCoeffs(2).toSeq == Seq(0.0, -0.5))
    // T3 = 4x^3 - 3x, monic x^3 - 0.75x      -> [0, -0.75, 0]
    assert(Precondition.chebyshevCoeffs(3).toSeq == Seq(0.0, -0.75, 0.0))
    // T4 = 8x^4 - 8x^2 + 1, monic x^4 - x^2 + 1/8 -> [0, -1, 0, 0.125]
    assert(Precondition.chebyshevCoeffs(4).toSeq == Seq(0.0, -1.0, 0.0, 0.125))
  }

  test("legendre monic coefficients match hand-derived values") {
    // P2 = (3x^2-1)/2, monic x^2 - 1/3       -> [0, -1/3]
    val l2 = Precondition.legendreCoeffs(2)
    assert(l2(0) == 0.0 && math.abs(l2(1) + 1.0 / 3.0) < 1e-15)
    // P3 = (5x^3-3x)/2, monic x^3 - 0.6x     -> [0, -0.6, 0]
    val l3 = Precondition.legendreCoeffs(3)
    assert(l3(0) == 0.0 && math.abs(l3(1) + 0.6) < 1e-15 && l3(2) == 0.0)
  }

  test("paper bound: max |c_i| <= 2^(0.3 n) for chebyshev degrees 1..10") {
    for (n <- 1 to 10) {
      val cs = Precondition.chebyshevCoeffs(n)
      assert(cs.map(math.abs).max <= math.pow(2, 0.3 * n) + 1e-12, s"degree $n")
    }
  }

  test("forward/reverse round-trip < 1e-10 (seeded random, both families, degrees 2/3/5)") {
    val gen = for {
      n <- Gen.chooseNum(0, 400)
      xs <- Gen.containerOfN[Array, Double](n, Gen.chooseNum(-1e3, 1e3))
      d <- Gen.oneOf(2, 3, 5)
      fam <- Gen.oneOf("chebyshev", "legendre")
    } yield (xs, d, fam)
    val prop = Prop.forAll(gen) { case (xs, d, fam) =>
      val c = Precondition.coeffs(fam, d)
      val rt = Precondition.reverse(Precondition.forward(xs, c), c)
      xs.zip(rt).forall { case (a, b) => math.abs(a - b) < 1e-10 }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.toString)
  }

  test("differencing special case: degree-1 legendre/chebyshev forward == diff with identity head") {
    // degree 1: monic poly x + 0 -> c = [0]? chebyshev T1 = x, monic x, c1 = 0
    // (the np.diff check in the reference uses explicit c=[-1]; emulate)
    val c = Array(-1.0)
    val xs = Array(5.0, 9.0, 12.0, 11.0)
    val f = Precondition.forward(xs, c)
    assert(f.toSeq == Seq(5.0, 4.0, 3.0, -1.0)) // y_t - y_{t-1} for t >= 1
  }
}
