package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins, composed from existing
  * operators so Catalyst/AQE still plan them (SURVEY.md §2 "custom
  * operators" preference (a)): the as-of join that enriches an event
  * stream with the latest state of another stream at event time — the
  * Flink-temporal-join / pandas-merge_asof shape a CDC consumer uses to
  * join a fact stream against a Debezium-fed dimension — and a
  * point-in-range (interval) join.
  *
  * Scale design:
  *  - `asOf` is a UNION + one window, NOT a join: one shuffle on the
  *    key, one sort — no candidate-pair explosion at any key
  *    cardinality, the plan a range-partitioned merge join would
  *    produce. Hot-key skew concentrates a key's full history in one
  *    task (the inherent as-of constraint); pre-filter or split the
  *    time range for pathological keys.
  *  - `pointInRange` avoids the BroadcastNestedLoopJoin Spark plans
  *    for inequality joins by bucketizing time into fixed bins and
  *    equi-joining on (key, bin): ranges emit one row per overlapped
  *    bin, points one row — pick binWidth ≈ the typical range width so
  *    the fan-out stays a small constant; an `assert_true` guards
  *    against a mis-sized bin blowing a range into thousands of rows.
  */
object TemporalJoin {

  /** For each left row, attach `payloadCols` from the LATEST right row
    * with the same key and rightTime <= leftTime (inclusive — the ASOF
    * `l.t >= r.t` convention); left rows with no eligible right row
    * keep NULL payloads (left-outer semantics).
    *
    * Right rows tied on (key, time) are resolved deterministically by
    * `tiebreakCols` ascending in their NATIVE type order — the LAST in
    * that order wins (equals DuckDB `max_by` on the tiebreak). A
    * non-orderable tiebreak type fails at analysis rather than
    * silently degrading.
    *
    * `leftTime`/`rightTime` must be mutually comparable (same type);
    * `payloadCols` (and `matchedTimeAs`) must not collide with left
    * column names. `keep` is the predicate deciding whether a match is
    * still valid given (leftTime, matchedRightTime) — pass e.g.
    * `(lt, rt) => lt - rt <= lit(tolMicros)` for merge_asof-style
    * tolerance; matches failing it are nulled out. */
  def asOf(left: DataFrame, right: DataFrame,
           keyCols: Seq[String],
           leftTime: String, rightTime: String,
           payloadCols: Seq[String],
           tiebreakCols: Seq[String] = Nil,
           matchedTimeAs: Option[String] = None,
           keep: Option[(Column, Column) => Column] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payloadCols.intersect(leftCols).isEmpty,
      s"payload columns ${payloadCols.intersect(leftCols)} collide with left columns — alias the right side first")
    val rightSchema = right.schema
    val leftSchema = left.schema
    def nullOf(df: org.apache.spark.sql.types.StructType, c: String) =
      lit(null).cast(df(c).dataType)

    // one shared layout: key, __t, __side (right=0 sorts before left=1
    // at equal time → "at or before" is inclusive), left cols, payload
    // cols, right tiebreaks
    val tb = tiebreakCols.map(c => s"__tb_$c")
    val l2 = left.select(
      keyCols.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side")) ++
        leftCols.filterNot(keyCols.contains).map(col) ++
        payloadCols.map(c => nullOf(rightSchema, c).as(c)) ++
        tiebreakCols.zip(tb).map { case (c, a) => nullOf(rightSchema, c).as(a) }: _*)
    val r2 = right.select(
      keyCols.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side")) ++
        leftCols.filterNot(keyCols.contains).map(c => nullOf(leftSchema, c).as(c)) ++
        payloadCols.map(col) ++
        tiebreakCols.zip(tb).map { case (c, a) => col(c).as(a) }: _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc +: col("__side").asc +: tb.map(col(_).asc_nulls_first): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry the matched right row as ONE struct: it is non-null exactly
    // when an eligible right row exists, so a legitimately-NULL payload
    // field in the latest right row stays NULL instead of falling
    // through to an older row (last(payload, ignoreNulls) would).
    val rrow = when(col("__side") === 0,
      struct(col("__t").as("__mt") +: payloadCols.map(col): _*))
    val filled = l2.unionByName(r2)
      .withColumn("__m", last(rrow, ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val ok = keep match {
      case None => col("__m").isNotNull
      case Some(pred) => col("__m").isNotNull && pred(col("__t"), col("__m.__mt"))
    }
    val out = keyCols ++ Seq(leftTime) ++
      leftCols.filterNot(c => keyCols.contains(c) || c == leftTime)
    filled
      .withColumn(leftTime, col("__t"))
      .withColumns(
        (payloadCols.map(c => c -> when(ok, col(s"__m.$c"))) ++
          matchedTimeAs.map(a => a -> when(ok, col("__m.__mt")))).toMap)
      .select((out ++ payloadCols ++ matchedTimeAs.toSeq).map(col): _*)
  }

  /** Inner join of point rows to range rows sharing `keyCols` with
    * rangeStart <= pointTime <= rangeEnd (inclusive ends), planned as
    * an EQUI join on (key, time bin). Time columns must be integral
    * (e.g. unix micros); `binWidth` is in the same unit. Each range
    * emits one row per overlapped bin (≤ maxBinsPerRange, enforced),
    * each matching pair surfaces exactly once. Output = point columns
    * + range columns (names must be disjoint apart from the keys). */
  def pointInRange(points: DataFrame, ranges: DataFrame,
                   keyCols: Seq[String],
                   pointTime: String, rangeStart: String, rangeEnd: String,
                   binWidth: Long, maxBinsPerRange: Int = 64): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val lo = expr(s"`$rangeStart` DIV $binWidth")
    val hi = expr(s"`$rangeEnd` DIV $binWidth")
    val rb = ranges
      .withColumn("__chk", assert_true(hi - lo < lit(maxBinsPerRange.toLong),
        lit(s"range spans >= $maxBinsPerRange bins — raise binWidth or maxBinsPerRange")))
      .withColumn("__bin", explode(sequence(lo, hi)))
      .drop("__chk")
    val pb = points.withColumn("__bin", expr(s"`$pointTime` DIV $binWidth"))
    pb.join(rb, keyCols :+ "__bin")
      .filter(col(pointTime) >= col(rangeStart) && col(pointTime) <= col(rangeEnd))
      .drop("__bin")
  }
}
