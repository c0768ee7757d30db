package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression computing ALL random-hyperplane LSH band
  * signatures of an embedding in ONE pass over the array.
  *
  * The Column-algebra form this replaces evaluated one interpreted
  * `aggregate(zip_with(vec, typedLit(coefs_p), qint·c), 0L, +)` PER
  * PLANE — llm08's 4 bands × 16 planes re-traversed (and re-boxed)
  * every 64-element vector 64 times per row. Here the quantized
  * element `floor(x·10⁶)` is loaded once and multiplied into all
  * `planes` accumulators (coefficients are a flat long[] baked into
  * the plan via a reference object — still integer multiply-adds
  * only, no hashing on the scan path), then each band packs its
  * sign bits. Output: array<long> of `bands` signatures, identical
  * bit-for-bit to the old per-plane columns (same quantization, same
  * int64 exact sums, so the DuckDB oracle rendering is unchanged).
  *
  * Null/shape semantics mirror the old form: a null element or a
  * length mismatch made every plane's contribution null, which
  * `when(contrib >= 0, bit).otherwise(0)` turned into an all-zero
  * signature — here any null element or `numElements != dims` yields
  * all-zero signatures for all bands.
  */
case class RhpSignatures(child: Expression, coefs: Array[Long],
                         dims: Int, bandSize: Int, bands: Int)
    extends UnaryExpression {

  require(coefs.length == dims * bandSize * bands,
    s"coefs must be (bandSize*bands) x dims flattened: ${coefs.length} != ${dims * bandSize * bands}")
  require(bandSize >= 1 && bandSize <= 63, s"bandSize must be in [1,63], got $bandSize")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private lazy val elemIsDouble = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rhp_signatures requires array<float> or array<double> input, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val planes = bandSize * bands
    val sigs = new Array[Long](bands)
    if (x.numElements() == dims) {
      val accs = new Array[Long](planes)
      var ok = true
      var i = 0
      while (ok && i < dims) {
        if (x.isNullAt(i)) ok = false
        else {
          val v = if (elemIsDouble) x.getDouble(i) else x.getFloat(i).toDouble
          val q = math.floor(v * 1e6).toLong
          var p = 0
          while (p < planes) { accs(p) += q * coefs(p * dims + i); p += 1 }
        }
        i += 1
      }
      if (ok) {
        var b = 0
        while (b < bands) {
          var s = 0L
          var j = 0
          while (j < bandSize) {
            if (accs(b * bandSize + j) >= 0) s |= (1L << j)
            j += 1
          }
          sigs(b) = s
          b += 1
        }
      }
    }
    new GenericArrayData(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (elemIsDouble) "getDouble" else "getFloat"
    val planes = bandSize * bands
    val coefsRef = ctx.addReferenceObj("rhpCoefs", coefs, "long[]")
    val accs = ctx.addMutableState("long[]", "rhpAccs",
      v => s"$v = new long[$planes];")
    nullSafeCodeGen(ctx, ev, a => {
      val sigs = ctx.freshName("sigs")
      val ok = ctx.freshName("ok")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val q = ctx.freshName("q")
      val s = ctx.freshName("s")
      s"""
         |final long[] $sigs = new long[$bands];
         |if ($a.numElements() == $dims) {
         |  java.util.Arrays.fill($accs, 0L);
         |  boolean $ok = true;
         |  for (int $i = 0; $ok && $i < $dims; $i++) {
         |    if ($a.isNullAt($i)) { $ok = false; break; }
         |    final long $q = (long) Math.floor(((double) $a.$getter($i)) * 1.0E6);
         |    for (int $p = 0; $p < $planes; $p++) {
         |      $accs[$p] += $q * $coefsRef[$p * $dims + $i];
         |    }
         |  }
         |  if ($ok) {
         |    for (int $b = 0; $b < $bands; $b++) {
         |      long $s = 0L;
         |      for (int $j = 0; $j < $bandSize; $j++) {
         |        if ($accs[$b * $bandSize + $j] >= 0L) $s |= (1L << $j);
         |      }
         |      $sigs[$b] = $s;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RhpSignatures =
    copy(child = newChild)
}

object RhpSignatures {
  /** Column-API entry point: `coefs` is (bandSize·bands) rows ×
    * dims — the layout [[graft.llm.Similarity.rhpCoefficients]]
    * produces, band b owning rows [b·bandSize, (b+1)·bandSize). */
  def apply(vec: Column, coefs: Seq[Seq[Long]], dims: Int,
            bandSize: Int, bands: Int): Column =
    ColumnBridge.column(
      RhpSignatures(ColumnBridge.expression(vec), coefs.flatten.toArray,
                    dims, bandSize, bands))
}
