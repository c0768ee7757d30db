package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All k MinHash signature values of a text's character n-gram
  * shingle set — and optionally the distinct hashed shingle set
  * itself — in ONE native pass over the string.
  *
  * The Column form this replaces
  * ([[graft.llm.Dedup.minhashSignatureText]]'s explode path) builds a
  * ROW per character position (~text-length rows per document),
  * pushes every one through a hash-aggregate on doc_id, and carries
  * k min() aggregation buffers per group. The values are pinned —
  * shingle = `substr(text, i, n)` for i in [1, max(len−n+1, 1)]
  * (UTF8String character semantics, short texts yield one truncated
  * shingle), base hash = [[Md5Prefix64]] % [[Portable.UniversalP]],
  * permutation j = (h·a_j + b_j) % P with [[Portable.universalCoeffs]],
  * set hash = xxhash64 seed 42 — so signatures and sets are
  * bit-identical to the explode path (property-pinned in
  * MinhashSigsSpec) and every existing DuckDB oracle replay holds.
  * Only the execution shape changes: per-document work happens in a
  * tight loop inside whole-stage codegen, no rows materialize, no
  * aggregate hash map is probed, and the MD5 digest per shingle —
  * the irreducible cost — is all that remains.
  *
  * `withSet=false` → array<long> of k mins. `withSet=true` →
  * struct(mh: array<long>, shh: array<long>) where shh is the
  * DISTINCT xxhash64 shingle hashes (sorted — callers use it as a
  * set; collect_set order was never meaningful). Null text → null.
  */
case class MinhashSigs(child: Expression, n: Int, k: Int, withSet: Boolean)
    extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")
  require(k >= 1 && k <= 64, s"signature count must be in [1,64], got $k")

  override def dataType: DataType =
    if (withSet) StructType(Seq(
      StructField("mh", ArrayType(LongType, containsNull = false), nullable = false),
      StructField("shh", ArrayType(LongType, containsNull = false), nullable = false)))
    else ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_sigs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs requires string input, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    if (withSet) MinhashSigs.sigsAndSet(input.asInstanceOf[UTF8String], n, k)
    else MinhashSigs.sigs(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (withSet) "sigsAndSet" else "sigs"
    defineCodeGen(ctx, ev, c => s"graft.functions.MinhashSigs.$fn($c, $n, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)
}

object MinhashSigs {
  private val P = Portable.UniversalP

  /** Permutation coefficients, cached per k (same derivation as
    * [[Portable.universalCoeffs]] — the values every oracle bakes in). */
  private val coefCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def coefs(k: Int): (Array[Long], Array[Long]) =
    coefCache.computeIfAbsent(k, kk => {
      val a = new Array[Long](kk); val b = new Array[Long](kk)
      var i = 0
      while (i < kk) {
        val (ai, bi) = Portable.universalCoeffs(i); a(i) = ai; b(i) = bi; i += 1
      }
      (a, b)
    })

  /** One pass: mins of all k permutations over the shingle hashes. */
  def sigs(text: UTF8String, n: Int, k: Int): GenericArrayData =
    new GenericArrayData(minsOf(text, n, k, null))

  /** Same pass, also collecting the DISTINCT xxhash64 shingle set. */
  def sigsAndSet(text: UTF8String, n: Int, k: Int): InternalRow = {
    val set = new java.util.HashSet[Long]()
    val mins = minsOf(text, n, k, set)
    val arr = new Array[Long](set.size())
    val it = set.iterator(); var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    InternalRow(new GenericArrayData(mins), new GenericArrayData(arr))
  }

  private def minsOf(text: UTF8String, n: Int, k: Int,
                     set: java.util.HashSet[Long]): Array[Long] = {
    val (as, bs) = coefs(k)
    val mins = Array.fill(k)(Long.MaxValue)
    val len = text.numChars()
    val last = math.max(len - n + 1, 1)
    var i = 1
    while (i <= last) {
      // UTF8String char semantics — identical to Column substr(i, n)
      val sh = text.substringSQL(i, n)
      val h = Md5Prefix64.hash(sh) % P
      var j = 0
      while (j < k) {
        val v = (h * as(j) + bs(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      if (set != null)
        set.add(org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(sh, StringType, 42L))
      i += 1
    }
    mins
  }

  def apply(text: Column, n: Int, k: Int, withSet: Boolean): Column =
    ColumnBridge.column(
      MinhashSigs(ColumnBridge.expression(text), n, k, withSet))
}
