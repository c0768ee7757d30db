package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native HyperLogLog register aggregate — the cardinality sibling of
  * [[CmsSketch]] (frequencies) and [[KmvSketch]] (order statistics):
  * `m` registers, each holding the maximum leading-zero rank (rho)
  * seen among the 54-bit hash suffixes routed to it. The buffer is a
  * FIXED m-long array whatever the corpus size; partial aggregation
  * merges element-wise MAX, so one m·8-byte array per partition is
  * all that moves where an exact distinct shuffles the vocabulary.
  *
  * Portability is the design constraint (the same contract as
  * CmsSketch): input is the already-[[Portable.hash64]]-hashed value
  * (uniform 60-bit), bucket = h % m, suffix w = h DIV m ∈ [0, 2^54),
  * and rho = 55 − bitlength(w) (w = 0 → 55) — pure integer ops any
  * engine replays (`len(bin(w))` in DuckDB), so the REGISTERS are
  * deterministic integers and the raw estimate built from them
  * ([[graft.llm.Sketches.hllRawEstimate]] — exact powers of two
  * summed in fixed register order) matches bit-for-bit. Spark's own
  * approx_count_distinct is the same algorithm but its registers are
  * not replayable outside Spark, which is why this exists.
  *
  * The emitted value is the register array itself (ordered by
  * bucket): estimates, merges across corpora, and the small-range
  * linear-counting correction (which needs `ln` — applied JVM-side
  * by [[HllSketch.estimate]], never inside a cross-engine compare)
  * are all downstream reads of that one artifact.
  */
case class HllSketch(child: Expression, m: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(m >= 16 && (m & (m - 1)) == 0, s"m must be a power of two >= 16, got $m")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](m)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = (h % m).toInt
      val w = h / m
      val rho = HllSketch.rho(w)
      if (rho > buffer(bucket)) buffer(bucket) = rho
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) {
      if (other(i) > buffer(i)) buffer(i) = other(i)
      i += 1
    }
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
  override def prettyName: String = "hll_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketch =
    copy(child = newChild)
}

object HllSketch {
  /** rho of a 54-bit suffix: 55 − bitlength(w), with the all-zero
    * suffix at the ceiling 55. Matches `55 - len(bin(w))` in any
    * engine with a binary-string builtin. */
  def rho(w: Long): Long =
    if (w == 0L) 55L else 55L - (64 - java.lang.Long.numberOfLeadingZeros(w))

  /** Bias constant alpha_m (Flajolet et al. 2007). */
  def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** FULL estimate with the small-range linear-counting correction —
    * JVM-side only (`ln` is libm and must never sit inside a
    * cross-engine value compare; the oracle checks the raw estimate
    * and registers instead). */
  def estimate(regs: Array[Long]): Double = {
    val m = regs.length
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += 1.0 / (1L << regs(i)).toDouble
      if (regs(i) == 0L) zeros += 1
      i += 1
    }
    val raw = alpha(m) * m * m / sum
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }
}
