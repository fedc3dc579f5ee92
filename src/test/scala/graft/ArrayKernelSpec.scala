package graft

import graft.functions.expressions.ArrayKernels
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.IntegerType
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the array kernels (ArrayExpressions.scala) against
 * straightforward Scala reference implementations over random int arrays
 * WITH nulls — the PlanSpec equivalence test covers the SQL-HOF parity on
 * one shape; this covers the kernel semantics across arbitrary inputs
 * (empty arrays, all-null arrays, ragged tails, negative values). */
class ArrayKernelSpec extends AnyFunSuite {

  private val elems: Gen[Option[Int]] =
    Gen.frequency(9 -> Gen.chooseNum(-50000, 50000).map(Some(_)), 1 -> Gen.const(None))
  private val arrays: Gen[Vector[Option[Int]]] =
    Gen.chooseNum(0, 80).flatMap(n => Gen.containerOfN[Vector, Option[Int]](n, elems))
  private def data(v: Vector[Option[Int]]) =
    new GenericArrayData(v.map(_.map(Int.box).orNull).toArray[Any])

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, r.toString)
  }

  test("sums, counts, positions match the Scala reference on arbitrary null-bearing arrays") {
    check(Prop.forAll(arrays) { v =>
      val a = data(v)
      val present = v.flatten.map(_.toLong)
      ArrayKernels.sumLong(a, isInt = true) == present.sum &&
      ArrayKernels.absSum(a, isInt = true) == present.map(math.abs).sum &&
      ArrayKernels.nullCount(a) == v.count(_.isEmpty) &&
      ArrayKernels.firstDataPos(a) == (v.indexWhere(_.isDefined) match {
        case -1 => 0L
        case i => i + 1L
      }) &&
      ArrayKernels.posWeightedSum(a, isInt = true, base = 1L) ==
        v.zipWithIndex.collect { case (Some(x), i) => x.toLong * (i + 1) }.sum
    })
  }

  test("structural kernels (every-kth, repeat-each, chunk, blur) match the Scala reference") {
    val gen = for { v <- arrays; k <- Gen.chooseNum(1, 9) } yield (v, k)
    def elemsOf(a: org.apache.spark.sql.catalyst.util.ArrayData): Vector[Option[Int]] =
      (0 until a.numElements())
        .map(i => if (a.isNullAt(i)) None else Some(a.getInt(i)))
        .toVector
    check(Prop.forAll(gen) { case (v, k) =>
      val a = data(v)
      elemsOf(ArrayKernels.everyKth(a, k, IntegerType)) ==
        v.zipWithIndex.collect { case (x, i) if i % k == 0 => x } &&
      elemsOf(ArrayKernels.repeatEach(a, k, IntegerType)) ==
        v.flatMap(x => Vector.fill(k)(x)) &&
      ArrayKernels
        .chunk(a, k, IntegerType)
        .array
        .toVector
        .map(c => elemsOf(c.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])) ==
        v.grouped(k).toVector
    })
  }

  test("blur4 + every-kth matches the clamped [1,2,1] reference on non-null arrays") {
    val gen = for {
      n <- Gen.chooseNum(0, 80)
      v <- Gen.containerOfN[Vector, Int](n, Gen.chooseNum(-50000, 50000))
      k <- Gen.chooseNum(1, 9)
    } yield (v, k)
    check(Prop.forAll(gen) { case (v, k) =>
      val a = new GenericArrayData(v.map(Int.box).toArray[Any])
      val want = v.indices.collect {
        case i if i % k == 0 =>
          v(math.max(i - 1, 0)).toLong + 2L * v(i) + v(math.min(i + 1, v.size - 1))
      }.toVector
      val got = ArrayKernels.blur4EveryKth(a, k, isInt = true)
      (0 until got.numElements()).map(got.getLong).toVector == want
    })
  }

  test("metric kernels match the Scala reference (err sums, seasonal, interval penalty)") {
    val gen = for {
      n <- Gen.chooseNum(0, 80)
      v <- Gen.containerOfN[Vector, Int](n, Gen.chooseNum(-50000, 50000))
      center <- Gen.chooseNum(-100.0, 100.0)
      m <- Gen.chooseNum(1, 30)
      lo <- Gen.chooseNum(-1000, 0)
      hi <- Gen.chooseNum(1, 1000)
    } yield (v, center, m, lo, hi)
    check(Prop.forAll(gen) { case (v, center, m, lo, hi) =>
      val a = new GenericArrayData(v.map(Int.box).toArray[Any])
      ArrayKernels.errQSum(a, isInt = true, center, 10000L, squared = false) ==
        v.map(x => math.floor(math.abs(x - center) * 10000 + 0.5).toLong).sum &&
      ArrayKernels.errQSum(a, isInt = true, center, 10000L, squared = true) ==
        v.map { x => val d = x - center; math.floor(d * d * 10000 + 0.5).toLong }.sum &&
      ArrayKernels.seasonalAbsSum(a, isInt = true, m) ==
        (m until v.size).map(t => math.abs(v(t).toLong - v(t - m))).sum &&
      ArrayKernels.intervalPenaltySum(a, isInt = true, lo, hi, 40L) ==
        v.map { y =>
          (hi.toLong - lo) +
            (if (y < lo) 40L * (lo - y) else 0L) +
            (if (y > hi) 40L * (y - hi) else 0L)
        }.sum
    })
  }

  test("affine-mod sequence matches the token formula; quantized sums match") {
    val gen = for {
      d <- Gen.chooseNum(0L, 5000000L)
      n <- Gen.chooseNum(0, 300)
    } yield (d, n)
    check(Prop.forAll(gen) { case (d, n) =>
      val got = ArrayKernels.affineModSeq(d, n, 2654435761L, 40503L, 50257L)
      (0 until got.numElements()).forall { p =>
        got.getInt(p) == (((d + 1) * 2654435761L + p * 40503L) % 50257L).toInt
      } && got.numElements() == n
    })
    // arr_sum_q / arr_abs_sum_q on double arrays
    val dgen = for {
      n <- Gen.chooseNum(0, 60)
      v <- Gen.containerOfN[Vector, Double](n, Gen.chooseNum(-500.0, 500.0))
    } yield v
    check(Prop.forAll(dgen) { v =>
      val a = new GenericArrayData(v.map(Double.box).toArray[Any])
      ArrayKernels.sumQuant(a, isFloat = false, 1000L) ==
        v.map(x => math.floor(x * 1000 + 0.5).toLong).sum &&
      ArrayKernels.absSumQuant(a, isFloat = false, 1000L) ==
        v.map(x => math.floor(math.abs(x) * 1000 + 0.5).toLong).sum
    })
  }
}
