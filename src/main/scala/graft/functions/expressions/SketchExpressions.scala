package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded k-minimum-values buffer: the k smallest DISTINCT hash values
 * seen so far, kept in a sorted set. State is O(k) regardless of input
 * cardinality — the whole point of the sketch at 10^12-point scale,
 * where the exact countDistinct shuffle is bounded by distinct
 * (key, token) pairs but the PER-GROUP state of this aggregate never
 * exceeds k longs. */
final class KmvBuffer(val set: java.util.TreeSet[java.lang.Long] = new java.util.TreeSet[java.lang.Long]())

/**
 * `kmv_kmin(hash, k)` — bounded-state k-minimum-values sketch aggregate:
 * returns the ascending array of the k smallest DISTINCT `hash` values in
 * the group (fewer if the group has fewer distinct values). The KMV
 * distinct-count estimator (Bar-Yossef et al., RANDOM'02: the k-th
 * smallest of n uniform hashes sits near k/n of the hash range, so
 * n_hat = (k-1) * RANGE / kth_min) derives downstream in one fixed
 * formula — kept OUT of the aggregate so the sketch itself is exact
 * integer state that any SQL engine reproduces with a dedup + rank.
 *
 * Deterministic and ORDER-INDEPENDENT: "k smallest distinct values" is a
 * pure set property, so partial buffers merge associatively and the
 * result is bit-stable under any partitioning — unlike HLL-family
 * sketches whose register layouts are implementation-defined, this one
 * hash-matches a plain SQL oracle.
 */
case class KmvKMin(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer]
    with UnaryLike[Expression] {

  require(k >= 1 && k <= 65536, s"kmv_kmin: k must be in [1, 65536], got $k")

  override def prettyName: String = "kmv_kmin"
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires BIGINT, got $t")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer()

  private def insert(b: KmvBuffer, v: Long): Unit = {
    val s = b.set
    if (s.size < k) { s.add(v); () }
    else if (v < s.last) {
      // only mutate when v displaces the current k-th minimum; the
      // common case at high cardinality is this O(1) rejection
      if (s.add(v)) s.pollLast()
      ()
    }
  }

  override def update(b: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) insert(b, v.asInstanceOf[Long])
    b
  }

  override def merge(b: KmvBuffer, o: KmvBuffer): KmvBuffer = {
    val it = o.set.iterator()
    var continue = true
    while (continue && it.hasNext) {
      val v = it.next()
      // o iterates ascending: once v can no longer qualify, none after it can
      if (b.set.size == k && v >= b.set.last) continue = false
      else insert(b, v)
    }
    b
  }

  override def eval(b: KmvBuffer): Any = {
    val out = new Array[Any](b.set.size)
    val it = b.set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * b.set.size)
    bb.putInt(b.set.size)
    val it = b.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new KmvBuffer()
    var i = 0
    while (i < n) { b.set.add(bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvKMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvKMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvKMin =
    copy(child = newChild)
}
