package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for the engine-portable quantized dot
  * product: Σ floor(xᵢ·10⁶)·floor(yᵢ·10⁶) over two float/double
  * arrays, as one codegen'd loop.
  *
  * This is the hot inner operation of every embedding operator
  * (cosine top-k llm03, RHP/IVF ANN llm04/08/11, semantic dedup
  * llm29): the Column-algebra formulation
  * `aggregate(zip_with(a, b, (x, y) => qint(x)*qint(y)), 0L, _+_)`
  * is evaluated INTERPRETED — higher-order-function lambdas never
  * reach whole-stage codegen, and each evaluation allocates the
  * zipped intermediate array. The brief's preference order (compose
  * built-ins → native Expression with doGenCode → UDF) lands here on
  * the middle rung: same semantics bit-for-bit (floor in double, long
  * multiply-add, null element or length mismatch → null, exactly like
  * zip_with's null padding + aggregate's null poisoning), but one
  * branch-free loop over the unsafe array data with zero allocation,
  * inlined into the surrounding WholeStageCodegen stage.
  */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private lazy val elemIsDouble = left.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"quantized_dot requires two array<float> or two array<double> inputs, got $l / $r")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (elemIsDouble) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (elemIsDouble) y.getDouble(i) else y.getFloat(i).toDouble
      acc += math.floor(xv * 1e6).toLong * math.floor(yv * 1e6).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (elemIsDouble) "getDouble" else "getFloat"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (long) Math.floor(((double) $a.$getter($i)) * 1.0E6)
         |          * (long) Math.floor(((double) $b.$getter($i)) * 1.0E6);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): QuantizedDot =
    copy(left = newLeft, right = newRight)
}

object QuantizedDot {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      QuantizedDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
