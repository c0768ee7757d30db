package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for Jaccard similarity of two
  * `array<long>` hashed-shingle sets:
  * `|A∩B| / |A∪B|` as one pass over the unsafe array data.
  *
  * The composed form `size(array_intersect(a,b)) / size(array_union
  * (a,b))` is the hot inner operation of every pair-verify stage (LSH
  * candidate verify llm09, calibration all-pairs llm87, curation
  * near-dedup llm148): per PAIR it materializes two intermediate
  * arrays and builds four hash tables of boxed values. This expression
  * computes both cardinalities in one pass over primitive longs with
  * two open-addressing tables and no intermediate arrays, inlined into
  * the surrounding codegen stage via a static helper.
  *
  * Value contract is EXACTLY the composed form's (pinned in
  * LongJaccardSpec): duplicate elements count once, a null ELEMENT
  * counts as one distinct value on each side (intersecting only if
  * both sides carry one), a null ARRAY yields null. ONE deliberate
  * divergence: two empty sets yield IEEE NaN where the composed
  * division RAISES under ANSI mode and yields NULL under non-ANSI —
  * production inputs (hashed shingle sets) are never empty, and a
  * degenerate row must not kill the job (the same posture as
  * Similarity.safeCosDiv). BEWARE the filter consequence (round-20
  * advice): Spark orders NaN GREATER than every double, so an
  * empty/empty pair PASSES `jaccard >= threshold` predicates where
  * the non-ANSI composed form's NULL would have dropped it — a caller
  * gating untrusted inputs on a threshold must exclude empty arrays
  * (or `isnan`) explicitly. Pinned in LongJaccardSpec.
  */
case class LongJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "long_jaccard"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"long_jaccard requires two array<bigint> inputs, got $l / $r")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    LongJaccard.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.LongJaccard.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): LongJaccard =
    copy(left = newLeft, right = newRight)
}

/** Sibling expression: asymmetric set containment
  * `|A∩B| / |A|` (distinct intersection over RAW |A| — exactly the
  * composed `size(array_intersect(a,b)) / size(a)`, where size counts
  * duplicates; inputs are distinct sets in practice so the two grains
  * coincide, but the contract mirrors the composed form precisely).
  * Same null semantics and the same deliberate NaN-for-0/0 divergence
  * as [[LongJaccard]]. */
case class LongContainment(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "long_containment"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"long_containment requires two array<bigint> inputs, got $l / $r")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    LongJaccard.computeContainment(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.LongJaccard.computeContainment($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): LongContainment =
    copy(left = newLeft, right = newRight)
}

object LongContainment {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      LongContainment(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

object LongJaccard {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      LongJaccard(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Open-addressing long set over parallel arrays; capacity is a
    * power of two sized at >= 2x the insert bound. */
  private final class Table(bound: Int) {
    private val cap = Integer.highestOneBit(math.max(4, bound * 2) * 2 - 1)
    private val mask = cap - 1
    private val vals = new Array[Long](cap)
    private val used = new Array[Boolean](cap)
    /** Insert; true if v was not present. */
    def add(v: Long): Boolean = {
      var i = java.lang.Long.hashCode(v) & mask
      while (used(i)) {
        if (vals(i) == v) return false
        i = (i + 1) & mask
      }
      used(i) = true; vals(i) = v; true
    }
    def contains(v: Long): Boolean = {
      var i = java.lang.Long.hashCode(v) & mask
      while (used(i)) {
        if (vals(i) == v) return true
        i = (i + 1) & mask
      }
      false
    }
  }

  /** One pass for |A∩B| and |A∪B| over primitive longs. Public static
    * for the codegen call. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val aSet = new Table(na)
    var aDistinct = 0
    var aNull = false
    var i = 0
    while (i < na) {
      if (a.isNullAt(i)) aNull = true
      else if (aSet.add(a.getLong(i))) aDistinct += 1
      i += 1
    }
    val bSeen = new Table(nb)
    var inter = 0
    var bExtra = 0
    var bNull = false
    var j = 0
    while (j < nb) {
      if (b.isNullAt(j)) bNull = true
      else {
        val v = b.getLong(j)
        if (bSeen.add(v)) {
          if (aSet.contains(v)) inter += 1 else bExtra += 1
        }
      }
      j += 1
    }
    val nullInter = if (aNull && bNull) 1 else 0
    val nullUnion = if (aNull || bNull) 1 else 0
    val interAll = inter + nullInter
    val unionAll = aDistinct + bExtra + nullUnion
    interAll.toDouble / unionAll.toDouble // 0/0 => NaN (deliberate, see scaladoc)
  }

  /** `|A∩B| (distinct, null-in-both counts once) / |A| (RAW element
    * count, duplicates and nulls included — size() semantics)`.
    * Public static for the codegen call. */
  def computeContainment(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val aSet = new Table(na)
    var aNull = false
    var i = 0
    while (i < na) {
      if (a.isNullAt(i)) aNull = true
      else aSet.add(a.getLong(i))
      i += 1
    }
    val bSeen = new Table(nb)
    var inter = 0
    var bNull = false
    var j = 0
    while (j < nb) {
      if (b.isNullAt(j)) bNull = true
      else {
        val v = b.getLong(j)
        if (bSeen.add(v) && aSet.contains(v)) inter += 1
      }
      j += 1
    }
    val interAll = inter + (if (aNull && bNull) 1 else 0)
    interAll.toDouble / na.toDouble // 0/0 => NaN (deliberate, see scaladoc)
  }
}
