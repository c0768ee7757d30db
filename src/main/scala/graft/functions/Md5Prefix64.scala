package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine's portable 60-bit hash as ONE native expression:
  * numerically identical to
  * `conv(substring(md5(c), 1, 15), 16, 10)::long` (the form any
  * engine with an md5() builtin reproduces — [[Portable.hash64]]'s
  * contract) but computed straight from the digest bytes. The
  * composed form pays, per row: a 32-char hex ENCODE inside `md5()`,
  * a substring slice, and a base-16 string PARSE inside `conv()` —
  * all allocation; the first 15 hex chars are just the first 7.5
  * digest bytes, so the value is seven shifts and a nibble. On the
  * shingle-heavy dedup family (one digest per n-gram) the hash is
  * the dominant scan cost, so this is the hot path of llm05/09/13/
  * 16/17/27/39 et al.
  *
  * Codegen'd via a static JVM helper with a per-thread reused
  * MessageDigest (the digest lookup is the other per-call allocation
  * the composed form pays). Null in → null out. Equality with the
  * composed form is property-tested (PortableHashSpec) — any
  * divergence would silently break every oracle, so the contract is
  * pinned, not assumed.
  */
case class Md5Prefix64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix64"

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix64 =
    copy(child = newChild)
}

object Md5Prefix64 {
  private val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 15 hex chars of md5(utf8 bytes) parsed base-16: digest
    * bytes 0..6 then the HIGH nibble of byte 7 (hex char 15). */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    fold(d)
  }

  /** Same hash over a raw utf8 byte slice — the allocation-free form
    * the gram-array scan ([[graft.llm.GramIndex.gramArrayJvm]]) calls
    * once per gram position, skipping the UTF8String wrapper + copy. */
  def hash(bytes: Array[Byte], offset: Int, len: Int): Long = {
    val md = digests.get()
    md.reset()
    md.update(bytes, offset, len)
    fold(md.digest())
  }

  private def fold(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }
}
