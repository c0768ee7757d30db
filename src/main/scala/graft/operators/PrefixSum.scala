package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global running totals — the scalable form of
  * `SUM(v) OVER (ORDER BY o)`.
  *
  * The naive Spark expression (`Window.orderBy(o)` with no partition)
  * moves EVERY row to one partition — the exact plan shape
  * WindowExec warns about, a non-starter at 100 TB. This operator is
  * the classic two-level scan instead:
  *
  *  1. rows bucket by `trunc(o / bucketWidth)` — a monotone step
  *     function of the order key, so each bucket owns a contiguous
  *     key range and buckets process in parallel;
  *  2. an intra-bucket running sum (window PARTITIONED by bucket —
  *     parallel, partial-agg friendly);
  *  3. per-bucket totals (one tiny row per bucket) get their own
  *     exclusive running sum on a frame whose size is the BUCKET
  *     count, not the row count — the only single-partition step,
  *     bounded by (key range / bucketWidth);
  *  4. a broadcast join adds each bucket's carried-in offset back.
  *
  * Tie semantics are RANGE (SQL's default window frame for an
  * ORDER BY sum): all rows sharing an order-key value report the same
  * running total — which also makes the result deterministic without
  * a tie-breaker column, on any engine.
  *
  * The reference has no analytics operators at all (SURVEY.md §0 —
  * debezium-server is a CDC runtime); this serves the event-stream
  * analytics surface grafted on top (peak-concurrency sweeps,
  * token-budget gates).
  */
object PrefixSum {

  /** Append `out` = running total of `valueCol` in `orderCol` order
    * (RANGE ties). `orderCol` must cast to long; `bucketWidth` sets
    * the parallel grain — size it so (max − min)/bucketWidth lands in
    * the hundreds-to-thousands (each bucket becomes one window
    * partition, and the offset frame stays trivially small). */
  def runningTotal(df: DataFrame, orderCol: Column, valueCol: Column,
                   bucketWidth: Long, out: String = "running_total"): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val keyed = df.withColumn("__ps_o", orderCol.cast("long"))
      // truncating DIV is monotone non-decreasing over the whole long
      // range (floor for positives, ceil for negatives — still a step
      // function), which is the only property bucketing needs
      .withColumn("__ps_b", expr(s"__ps_o DIV $bucketWidth"))
    // intra-bucket running sum: default RANGE frame (ties share totals)
    val intra = keyed.withColumn("__ps_i",
      sum(valueCol).over(Window.partitionBy(col("__ps_b")).orderBy(col("__ps_o"))))
    // exclusive prefix over bucket TOTALS: one row per bucket, so the
    // unpartitioned window is bounded by the bucket count by design
    val offsets = keyed.groupBy(col("__ps_b")).agg(sum(valueCol).as("__ps_t"))
      .withColumn("__ps_off",
        coalesce(sum(col("__ps_t")).over(
          Window.orderBy(col("__ps_b"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__ps_b"), col("__ps_off"))
    intra.join(broadcast(offsets), "__ps_b")
      .withColumn(out, col("__ps_i") + col("__ps_off"))
      .drop("__ps_b", "__ps_o", "__ps_i")
  }
}
