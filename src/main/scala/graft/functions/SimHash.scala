package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** SimHash document fingerprinting (Charikar, STOC 2002 — public spec):
 * 64-bit signature whose per-bit sign is the sign of the sum of ±1 votes
 * from each term's 64-bit hash. Near-duplicate documents differ in few
 * bits (small Hamming distance). */
object SimHash {

  /** FNV-1a 64-bit — public-domain hash, deterministic across JVMs. */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def simhash64(terms: Iterator[String]): Long = {
    val votes = new Array[Int](64)
    while (terms.hasNext) {
      val h = fnv1a64(terms.next())
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** [[simhash64]] straight off ArrayData — the shared entry point for the
   * interpreted eval AND the generated Java call of the `simhash64`
   * expression, so it keeps a real `doGenCode` (the CodecKernels pattern)
   * instead of a span-breaking CodegenFallback. */
  def simhashData(arr: ArrayData): Long =
    simhash64((0 until arr.numElements()).iterator.map(i => arr.getUTF8String(i).toString))
}

/** Catalyst expression: simhash64(array<string>) -> bigint.
 *
 * Real `doGenCode` (one-line call into [[SimHash.simhashData]]) — the
 * expression sits in the fingerprint projection of every simhash dedup
 * query, and a CodegenFallback would break the whole-stage span around
 * every co-resident expression (the measured dot_q effect). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $t")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(input: Any): Any =
    SimHash.simhashData(input.asInstanceOf[ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"${ev.value} = graft.functions.SimHash$$.MODULE$$.simhashData($c);")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
