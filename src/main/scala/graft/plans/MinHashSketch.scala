package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as ONE imperative aggregate: the buffer is the
  * whole k-wide signature and each input hash updates all k permutation
  * minima in a primitive loop.
  *
  * The compose-built-ins alternative (k independent `min(pmod(h*a+b,p))`
  * aggregates) carries k aggregate buffers through the shuffle and
  * generates k expression trees per row — the generated update method
  * for k=64 is enormous. One typed buffer keeps the row narrow and the
  * update tight; partial aggregation (map-side combine) still applies
  * because `merge` is elementwise min.
  */
case class MinHashSketch(
    child: Expression,
    permsA: Seq[Long],
    permsB: Seq[Long],
    prime: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  // Seq params (not Array): case-class equality stays value-based, so
  // two identically-constructed sketches are semanticEquals — CSE and
  // exchange reuse apply. Hot loops index the materialized arrays.

  @transient private lazy val pa: Array[Long] = permsA.toArray
  @transient private lazy val pb: Array[Long] = permsB.toArray

  private def k = permsA.length

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sketch expects a bigint hash input, got ${other.sql}")
  }

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        // (h*a+b) mod p — Long wrap-around is fine: it is a fixed
        // deterministic permutation family, identical across engines
        var x = (h * pa(i) + pb(i)) % prime
        if (x < 0) x += prime
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSketch =
    copy(child = newChildren.head)
}
