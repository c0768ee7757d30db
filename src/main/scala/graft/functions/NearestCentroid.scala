package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for the k-means assignment step: the
  * index of the nearest centroid (quantized squared-L2) plus that
  * distance, in ONE pass over the vector.
  *
  * Centroids are already in QUANTIZED space (the element-wise
  * `floor(x·10⁶)` integer lattice every embedding operator here
  * shares — see [[QuantizedDot]]); the input vector quantizes
  * element-by-element inside the loop, so each distance is an exact
  * int64 sum Σ(qᵥ−q꜀)² — order-independent and reproducible on any
  * engine, which is what lets a DuckDB oracle replay Lloyd's
  * iterations bit-for-bit. Ties break to the LOWEST centroid index
  * (strict `<`), matching `row_number() OVER (ORDER BY dist, cid)`.
  *
  * The k×dims centroid matrix rides the plan as a flat reference
  * array — broadcast-by-literal, the same pattern as
  * [[RhpSignatures]]' hyperplanes: at any corpus scale the assignment
  * is a map-side projection with NO join and no shuffle.
  *
  * Null/shape semantics: a null element or `numElements != dims`
  * yields null (such a vector belongs to no cell), mirroring
  * aggregate-over-zip null poisoning.
  */
case class NearestCentroid(child: Expression, centroids: Array[Long],
                           dims: Int, k: Int)
    extends UnaryExpression {

  require(centroids.length == k * dims,
    s"centroids must be k x dims flattened: ${centroids.length} != ${k * dims}")
  require(k >= 1, s"k must be >= 1, got $k")

  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("qdist", LongType, nullable = false)))
  override def nullable: Boolean = true

  private lazy val elemIsDouble = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires array<float> or array<double> input, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() != dims) return null
    val q = new Array[Long](dims)
    var i = 0
    while (i < dims) {
      if (x.isNullAt(i)) return null
      val v = if (elemIsDouble) x.getDouble(i) else x.getFloat(i).toDouble
      q(i) = math.floor(v * 1e6).toLong
      i += 1
    }
    var bestCell = 0
    var bestDist = Long.MaxValue
    var c = 0
    while (c < k) {
      var d = 0L
      var j = 0
      while (j < dims) {
        val diff = q(j) - centroids(c * dims + j)
        d += diff * diff
        j += 1
      }
      if (d < bestDist) { bestDist = d; bestCell = c }
      c += 1
    }
    InternalRow(bestCell, bestDist)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (elemIsDouble) "getDouble" else "getFloat"
    val centRef = ctx.addReferenceObj("centroids", centroids, "long[]")
    val qBuf = ctx.addMutableState("long[]", "ncQBuf", v => s"$v = new long[$dims];")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val bestCell = ctx.freshName("bestCell")
      val bestDist = ctx.freshName("bestDist")
      s"""
         |if ($a.numElements() != $dims) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $dims && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $qBuf[$i] = (long) Math.floor(((double) $a.$getter($i)) * 1.0E6);
         |  }
         |  if (!${ev.isNull}) {
         |    int $bestCell = 0;
         |    long $bestDist = Long.MAX_VALUE;
         |    for (int $c = 0; $c < $k; $c++) {
         |      long $d = 0L;
         |      for (int $j = 0; $j < $dims; $j++) {
         |        final long $diff = $qBuf[$j] - $centRef[$c * $dims + $j];
         |        $d += $diff * $diff;
         |      }
         |      if ($d < $bestDist) { $bestDist = $d; $bestCell = $c; }
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |      new Object[] { $bestCell, $bestDist });
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  /** Column-API entry point: `centroids` is k rows × dims, row c =
    * quantized centroid c. Result: struct(cell int, qdist long). */
  def apply(vec: Column, centroids: Seq[Seq[Long]], dims: Int): Column =
    ColumnBridge.column(
      NearestCentroid(ColumnBridge.expression(vec),
        centroids.flatten.toArray, dims, centroids.length))
}
