package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series repair over an irregular keyed series:
  * materialize every (key, tick) cell of the global tick range and
  * carry the last observation forward across the gaps — the resample
  * step ("daily metrics with no silent holes") every monitoring and
  * feature pipeline runs before aggregation or training.
  *
  * 100 TB shape: the tick grid is ONE broadcast frame (global
  * min..max — ticks are days/hours, thousands at most) cross-joined
  * to the distinct keys, so the only real shuffle is the (key, tick)
  * left join plus one per-key window for the carry-forward. Output
  * cardinality is keys × ticks BY DESIGN — callers bound the tick
  * range (resample grain) and key set; the fill itself adds no
  * arithmetic, values are copied, so cross-engine equality is exact.
  */
object TimeSeries {

  /** `df` is the OBSERVED series: one row per (key, tick) with a
    * value (pre-aggregate duplicates upstream). Returns every
    * (key, tick) of the dense grid with `has_obs` and the
    * forward-filled value (`fillDefault` before a key's first
    * observation). */
  def gapFillForward(df: DataFrame, keyCol: Column, tickCol: Column,
                     valueCol: Column, fillDefault: Column): DataFrame = {
    val obs = df.select(keyCol.as("key"), tickCol.cast("long").as("tick"),
                        valueCol.as("v"))
    val rng = obs.agg(min(col("tick")).as("t0"), max(col("tick")).as("t1"))
    // loud guard, not an OOM: sequence() materializes the whole range
    // in one row — a caller who passes raw micros instead of a
    // resampled grain would otherwise build a billion-element array
    val ticks = rng.select(explode(sequence(col("t0"),
      when(col("t1") - col("t0") > 1000000L,
        raise_error(concat(lit("gapFillForward: tick range "),
          (col("t1") - col("t0")).cast("string"),
          lit(" exceeds 1e6 — resample tickCol to a coarser grain"))).cast("long"))
        .otherwise(col("t1")))).as("tick"))
    val grid = obs.select(col("key")).distinct().crossJoin(broadcast(ticks))
    val w = Window.partitionBy(col("key")).orderBy(col("tick"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("key", "tick"), "left")
      .withColumn("has_obs", col("v").isNotNull)
      .withColumn("filled_value",
        coalesce(last(col("v"), ignoreNulls = true).over(w), fillDefault))
      .drop("v")
  }
}
