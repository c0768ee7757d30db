package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Space-filling-curve data layout — the lakehouse `OPTIMIZE ZORDER`
  * write pattern. Interleaving the bits of two clustering dimensions
  * yields ONE sort key whose contiguous ranges are tight rectangles in
  * BOTH dimensions, so per-file min/max statistics prune scans for
  * predicates on either column (a plain sort clusters only its leading
  * column; the trailing one degenerates to the full range in every
  * file). At 100 TB this is how a table stays skippable for two
  * independent access paths without storing it twice.
  *
  * Everything here is pure column algebra — `2·bits` shift/mask/add
  * terms, fully whole-stage-codegen'd, no shuffle. The layout write
  * itself is `repartitionByRange(zValue)` (range partition = one
  * exchange), which [[zorderLayout]] composes; the analysis queries
  * need only the bucket projection.
  *
  * The reference has no storage layout layer (it delegates to its
  * sinks); this grafts the standard lakehouse technique onto the same
  * parquet-backed tables the upsert sink manages.
  */
object Layout {

  /** Morton/Z value: interleave the low `bits` bits of two
    * non-negative integral columns — `a` on even bit positions, `b`
    * on odd. Callers clamp the inputs into `[0, 2^bits)` first
    * ([[clampDim]]); values outside would alias, not fail. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val al = a.cast("long")
    val bl = b.cast("long")
    val terms = (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i),
          shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** DuckDB rendering of [[zValue]] — generated from the same loop so
    * the two engines cannot drift. */
  def duckZValue(aExpr: String, bExpr: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).flatMap { i =>
      Seq(s"(((($aExpr) >> $i) & 1) << ${2 * i})",
          s"(((($bExpr) >> $i) & 1) << ${2 * i + 1})")
    }.mkString("(", " + ", ")")
  }

  /** Clamp a dimension into `[0, 2^bits)` — the caller picks a bucket
    * grain (`x DIV width`) so the live range fits; clamping keeps the
    * projection total when data outgrows it (tail values cluster in
    * the last cell instead of corrupting the curve). */
  def clampDim(c: Column, bits: Int): Column =
    least(greatest(c.cast("long"), lit(0L)), lit((1L << bits) - 1))

  def duckClampDim(expr: String, bits: Int): String =
    s"least(greatest(CAST($expr AS BIGINT), 0), ${(1L << bits) - 1})"

  /** Z-range bucket: the top `log2Buckets` bits of the `2·bits`-wide
    * z value. Each bucket is one contiguous z range = one tight
    * rectangle-union in (a, b) space — the unit of file skipping. */
  def zBucket(a: Column, b: Column, bits: Int, log2Buckets: Int): Column = {
    require(log2Buckets >= 1 && log2Buckets <= 2 * bits,
      s"log2Buckets must be in [1, ${2 * bits}], got $log2Buckets")
    shiftright(zValue(a, b, bits), 2 * bits - log2Buckets)
  }

  def duckZBucket(aExpr: String, bExpr: String, bits: Int, log2Buckets: Int): String =
    s"(${duckZValue(aExpr, bExpr, bits)} >> ${2 * bits - log2Buckets})"

  /** The layout write: range-partition on the z value (one exchange,
    * AQE-balanced) so each output file covers one contiguous z range.
    * `partitions` ≈ target file count; at scale size it to the table
    * (bytes / target file size). */
  def zorderLayout(df: org.apache.spark.sql.DataFrame, a: Column, b: Column,
                   bits: Int, partitions: Int): org.apache.spark.sql.DataFrame =
    df.repartitionByRange(partitions, zValue(clampDim(a, bits), clampDim(b, bits), bits))
}
