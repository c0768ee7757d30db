package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native Count-Min sketch aggregate — the frequency sibling of
  * [[KmvSketch]] (distinct counts): a depth×width counter matrix
  * where every occurrence increments one counter per row, chosen by
  * that row's universal hash of the value. A key's estimate is the
  * MINIMUM of its depth counters — always ≥ the true count, over by
  * at most the collision mass of the lightest row (the classic
  * Cormode–Muthukrishnan ε ≈ e/width bound at scale n).
  *
  * The buffer is a FIXED depth·width Long array regardless of corpus
  * size — partial aggregation merges element-wise sums, so the only
  * bytes that move are one matrix per partition (8·d·w, ~8 KB at
  * 4×256) where an exact count shuffles the whole vocabulary. The
  * hash functions are the repo's portable universal family
  * ([[Portable.universalCoeffs]] over [[Portable.baseHash31]]), so
  * with fixed (depth, width) the whole sketch — counters AND
  * estimates — is deterministic integers any engine replays exactly
  * (the llm72 oracle restates each counter as the collision-bucket
  * sum over exact counts).
  *
  * Input: the already-hashed column (`Portable.baseHash31`, uniform
  * on [0, 2^31−1)). Nulls are skipped. Estimates read the emitted
  * array with [[graft.llm.Sketches.cmsEstimate]] — pure Column
  * algebra, no UDF.
  */
case class CmsSketch(child: Expression, depth: Int, width: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16, s"depth in [1, 16], got $depth")
  require(width >= 2, s"width must be >= 2, got $width")

  @transient private lazy val coeffs: Array[(Long, Long)] =
    Array.tabulate(depth)(Portable.universalCoeffs)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < depth) {
        val (a, b) = coeffs(i)
        buffer(i * width + (((h * a + b) % Portable.UniversalP) % width).toInt) += 1L
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketch =
    copy(child = newChild)
}
