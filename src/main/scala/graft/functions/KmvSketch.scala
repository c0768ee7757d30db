package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Shared buffer machinery of the native KMV aggregates: the k
  * smallest DISTINCT hashes in a bounded tree per partition (partial
  * aggregation), so the only bytes that move are one ≤k-entry buffer
  * per partition into the final merge — O(partitions · k · 8 bytes),
  * independent of corpus size. The DataFrame formulation
  * (`distinct().orderBy(h).limit(k)`) shuffles EVERY distinct hash to
  * evaluate the same k-item order statistic.
  *
  * Input: the already-hashed column ([[Portable.hash64]], uniform on
  * [0, 2^60)). Nulls are skipped, duplicates collapse inside the
  * sketch (TreeSet semantics), and a buffer never exceeds k longs.
  */
abstract class KmvAggregateBase
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

  def child: Expression
  def k: Int

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buffer: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      if (buffer.size < k) buffer.add(h)
      else if (h < buffer.last() && buffer.add(h)) buffer.pollLast()
    }
    buffer
  }

  override def merge(buffer: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    buffer.addAll(other)
    while (buffer.size > k) buffer.pollLast()
    buffer
  }

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    buffer.forEach(h => { bb.putLong(h); () })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val set = new java.util.TreeSet[java.lang.Long]()
    (0 until n).foreach(_ => set.add(bb.getLong))
    set
  }

  override def nullable: Boolean = false
}

/** Native KMV (k-minimum-values) distinct-count sketch — the
  * single-pass production form of
  * [[graft.llm.Sketches.kmvEstimate]].
  *
  * The estimate is bit-identical to the DataFrame path — same
  * portable 60-bit hash input, same Bar-Yossef estimator
  * `(k−1)·2^60/h_(k)` (one IEEE multiply + divide of
  * exactly-representable doubles), same exact-below-k rule — so the
  * two forms are interchangeable and cross-checkable (the llm13
  * oracle keeps value-checking the DataFrame form; KmvSketchSpec
  * pins this aggregate to it).
  */
case class KmvSketch(child: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends KmvAggregateBase {

  require(k >= 2, s"kmv needs k >= 2, got $k")

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any =
    if (buffer.size < k) buffer.size.toDouble
    else (k - 1).toDouble * graft.llm.Sketches.HashSpace / buffer.last().toDouble

  override def dataType: DataType = DoubleType
  override def prettyName: String = "kmv_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

/** The SKETCH ITSELF as a value: the k smallest distinct hashes in
  * ascending order (array<long>, ≤k entries). This is what set
  * operations need — [[graft.llm.Sketches.kmvOverlap]] combines two
  * groups' value sketches into a union sketch for Jaccard /
  * intersection estimates — where [[KmvSketch]] collapses the buffer
  * straight to the count estimate. Same buffer, same shuffle bound,
  * same order statistics. */
case class KmvValues(child: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends KmvAggregateBase {

  require(k >= 2, s"kmv needs k >= 2, got $k")

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buffer.size)
    var i = 0
    val it = buffer.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_values"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvValues =
    copy(child = newChild)
}
