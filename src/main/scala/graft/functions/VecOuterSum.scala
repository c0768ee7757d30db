package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native second-moment aggregate over quantized embedding vectors —
  * the covariance/PCA-prep pass vector pipelines run before whitening,
  * OPQ rotation, or correlated-dimension pruning. One pass accumulates
  * everything a covariance matrix needs:
  *
  *   buffer[0]                    = n (vectors seen)
  *   buffer[1 .. d]               = per-dimension sums  Σ q_i
  *   buffer[1+d .. 1+d+T-1]       = upper-triangle pair sums Σ q_i·q_j
  *                                  (T = d(d+1)/2, row-major i ≤ j)
  *
  * so scaled covariance c_ij = n·Σq_iq_j − Σq_i·Σq_j derives
  * INTEGER-EXACTLY downstream — no means, no divisions, no float
  * accumulation order to disagree about across engines.
  *
  * Scale shape (100 TB of vectors): the buffer is a FIXED
  * (1 + d(d+3)/2)-long array — ~17 KB at d=64 — whatever the corpus
  * size; partial aggregation merges element-wise SUM, so one buffer
  * per partition is all that moves. The explode-the-pairs alternative
  * ships d(d+1)/2 rows per VECTOR across the exchange — 2080× more.
  * Work per vector is the d²/2 multiply-adds covariance inherently
  * costs. Inputs are pre-quantized longs (floor(x·1e6), the llm03
  * discipline); at 10⁹+ vectors drop the quantization scale (1e3)
  * to keep n·Σq_iq_j inside int64 — the documented dial.
  */
case class VecOuterSum(child: Expression, d: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(d >= 2 && d <= 256, s"d must be in [2, 256], got $d")

  private val pairs = d * (d + 1) / 2

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](1 + d + pairs)

  /** NULL vectors are skipped (standard aggregate null semantics —
    * same as built-in sum/avg); a NON-NULL vector whose length is not
    * `d` throws, because silently dropping it would yield covariance
    * statistics over an undisclosed subset of a ragged column. */
  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() != d) {
        throw new IllegalArgumentException(
          s"VecOuterSum(d=$d) got a vector of length ${arr.numElements()} — " +
            "ragged embedding column (filter or pad upstream)")
      }
      val q = new Array[Long](d)
      var i = 0
      while (i < d) { q(i) = arr.getLong(i); i += 1 }
      buffer(0) += 1L
      i = 0
      var k = 1 + d
      while (i < d) {
        buffer(1 + i) += q(i)
        var j = i
        while (j < d) {
          buffer(k) += q(i) * q(j)
          k += 1
          j += 1
        }
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
  override def prettyName: String = "vec_outer_sum"

  override def withNewMutableAggBufferOffset(newOffset: Int): VecOuterSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecOuterSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecOuterSum =
    copy(child = newChild)
}

object VecOuterSum {
  /** Flat offset of pair (i, j), i <= j, into the triangle section:
    * row-major over rows of shrinking width. */
  def triIndex(i: Int, j: Int, d: Int): Int =
    i * d - i * (i - 1) / 2 + (j - i)
}
