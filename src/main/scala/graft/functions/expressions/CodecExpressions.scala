package graft.functions.expressions

import graft.functions.{DeltaOfDelta, GorillaCodec}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Catalyst expressions for the tier-payload codecs (north-rule mandated:
 * "Gorilla XOR + delta-of-delta ... implemented as Catalyst
 * expressions/UDAFs"). Interpreted `nullSafeEval` with `CodegenFallback`
 * first (SURVEY.md §4: custom Catalyst work item 1) — the per-row work is a
 * tight Scala loop over a primitive array, so codegen would only remove the
 * call overhead, not the loop.
 *
 * The whole payload lives in ONE row's blob; decode never needs state from
 * another row (reference series-boundary rule,
 * uni2ts/src/uni2ts/transform/precondition.py:176-185).
 */
case class GorillaEncode(child: Expression)
    extends UnaryExpression
    with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double>, got $t")
    }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "gorilla_encode"
  override protected def nullSafeEval(input: Any): Any =
    GorillaCodec.encode(input.asInstanceOf[ArrayData].toDoubleArray())
  override protected def withNewChildInternal(newChild: Expression): GorillaEncode =
    copy(child = newChild)
}

case class GorillaDecode(child: Expression)
    extends UnaryExpression
    with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BinaryType, got ${child.dataType}")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "gorilla_decode"
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(GorillaCodec.decode(input.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(newChild: Expression): GorillaDecode =
    copy(child = newChild)
}

case class ChimpEncode(child: Expression)
    extends UnaryExpression
    with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double>, got $t")
    }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "chimp_encode"
  override protected def nullSafeEval(input: Any): Any =
    graft.functions.ChimpCodec.encode(input.asInstanceOf[ArrayData].toDoubleArray())
  override protected def withNewChildInternal(newChild: Expression): ChimpEncode =
    copy(child = newChild)
}

case class ChimpDecode(child: Expression)
    extends UnaryExpression
    with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BinaryType, got ${child.dataType}")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "chimp_decode"
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(graft.functions.ChimpCodec.decode(input.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(newChild: Expression): ChimpDecode =
    copy(child = newChild)
}

case class DodEncode(child: Expression)
    extends UnaryExpression
    with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got $t")
    }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "dod_encode"
  override protected def nullSafeEval(input: Any): Any =
    DeltaOfDelta.encode(input.asInstanceOf[ArrayData].toLongArray())
  override protected def withNewChildInternal(newChild: Expression): DodEncode =
    copy(child = newChild)
}

case class DodDecode(child: Expression)
    extends UnaryExpression
    with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BinaryType, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dod_decode"
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(DeltaOfDelta.decode(input.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(newChild: Expression): DodDecode =
    copy(child = newChild)
}
