package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Vector kernels for the similarity/ANN operators — tight JVM loops inside
 * single Catalyst expressions, replacing the round-1 SQL higher-order
 * functions (`zip_with`/`aggregate` lambdas), which evaluate INTERPRETED
 * per element (~100 µs/element measured in this environment, BENCH.md
 * round-1 lesson). One expression eval per candidate pair costs one virtual
 * call + an O(dim) primitive loop.
 *
 * Quantization contract (shared with every DuckDB similarity oracle):
 * q(x) = floor(double(x) * 1000 + 0.5) as a Long, so dot products and
 * norms are exact integer sums — order-free and bit-identical across
 * engines; the final cosine is one deterministic double expression.
 */
object VectorKernels {

  def quantize(x: Double): Long = math.floor(x * 1000.0 + 0.5).toLong

  /** Exact quantized dot product of two numeric arrays (min-length). */
  def dotQ(a: Array[Double], b: Array[Double]): Long = {
    val n = math.min(a.length, b.length)
    var s = 0L
    var i = 0
    while (i < n) {
      s += quantize(a(i)) * quantize(b(i))
      i += 1
    }
    s
  }

  /** Random-hyperplane LSH signature over the quantized vector; plane
   * weights are small signed ints derived from xxhash64(plane*1024+dim)
   * with Spark's default seed 42 — identical to the SQL formulation it
   * replaces, deterministic at any parallelism. */
  def lshSig(v: Array[Double], nPlanes: Int): Long = {
    var acc = 0L
    var p = 0
    while (p < nPlanes) {
      var s = 0L
      var d = 0
      while (d < v.length) {
        val h = XXH64.hashLong(p.toLong * 1024L + d, 42L)
        val w = ((h % 7L) + 7L) % 7L - 3L
        s += quantize(v(d)) * w
        d += 1
      }
      acc = acc * 2L + (if (s >= 0L) 1L else 0L)
      p += 1
    }
    acc
  }

  /** Allocation-free dot product straight off ArrayData — the entry point
   * both the interpreted eval and the generated Java call (so DotQ stays
   * inside whole-stage codegen instead of forcing a fallback). */
  def dotQData(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += quantize(x) * quantize(y)
      i += 1
    }
    s
  }

  def toDoubles(arr: ArrayData, elem: DataType): Array[Double] = elem match {
    case DoubleType => arr.toDoubleArray()
    case FloatType =>
      val f = arr.toFloatArray()
      val out = new Array[Double](f.length)
      var i = 0
      while (i < f.length) { out(i) = f(i).toDouble; i += 1 }
      out
    case _ => throw new IllegalStateException(s"unsupported element type $elem")
  }
}

/** `dot_q(a, b) -> bigint`: exact fixed-point dot product (see
 * [[VectorKernels]]). `dot_q(v, v)` is the squared norm.
 *
 * Has a real `doGenCode` (a one-line call into the static kernel), so the
 * surrounding projection/filter stays inside WHOLE-STAGE CODEGEN — a
 * `CodegenFallback` here would break the span around every candidate pair
 * in the similarity joins. */
case class DotQ(left: Expression, right: Expression) extends BinaryExpression {

  private def elemOf(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemOf(left.dataType), elemOf(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float|double>, got ${left.dataType}, ${right.dataType}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_q"

  private def aFloat = elemOf(left.dataType).contains(FloatType)
  private def bFloat = elemOf(right.dataType).contains(FloatType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dotQData(
      a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData],
      aFloat,
      bFloat)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) =>
        s"${ev.value} = graft.functions.expressions.VectorKernels$$.MODULE$$" +
          s".dotQData($a, $b, $aFloat, $bFloat);")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): DotQ = copy(left = newLeft, right = newRight)
}

/** `lsh_sig(vec, nPlanes) -> bigint`: hyperplane-LSH bucket signature. */
case class LshSig(child: Expression, nPlanes: Int)
    extends UnaryExpression
    with CodegenFallback {

  private def elemOf(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOf(child.dataType).isDefined && nPlanes >= 1 && nPlanes <= 63)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> and 1<=nPlanes<=63, got ${child.dataType}, $nPlanes")

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_sig"

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.lshSig(
      VectorKernels.toDoubles(input.asInstanceOf[ArrayData], elemOf(child.dataType).get),
      nPlanes)

  override protected def withNewChildInternal(newChild: Expression): LshSig =
    copy(child = newChild)
}
