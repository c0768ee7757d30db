package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("gapFillForward: dense grid, carry-forward across gaps, default before first obs") {
    // key a observes at ticks 1 and 4; key b only at tick 3
    val obs = Seq(("a", 1L, 10.0), ("a", 4L, 40.0), ("b", 3L, 30.0))
      .toDF("k", "t", "v")
    val out = TimeSeries.gapFillForward(obs, col("k"), col("t"), col("v"),
        fillDefault = lit(-1.0))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(out == Seq(
      ("a", 1L, true, 10.0), ("a", 2L, false, 10.0), ("a", 3L, false, 10.0),
      ("a", 4L, true, 40.0),
      // b has no observation before tick 3 — the default fills
      ("b", 1L, false, -1.0), ("b", 2L, false, -1.0), ("b", 3L, true, 30.0),
      ("b", 4L, false, 30.0)))
  }

  test("gapFillForward rejects an unresampled tick range loudly") {
    val obs = Seq(("x", 0L, 1.0), ("x", 5000000L, 2.0)).toDF("k", "t", "v")
    val ex = intercept[Exception] {
      TimeSeries.gapFillForward(obs, col("k"), col("t"), col("v"), lit(0.0)).collect()
    }
    assert(ex.getMessage != null)
  }

  test("gapFillForward: single-tick series is identity") {
    val obs = Seq(("x", 7L, 1.5)).toDF("k", "t", "v")
    val out = TimeSeries.gapFillForward(obs, col("k"), col("t"), col("v"), lit(0.0))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("x", 7L, true, 1.5)))
  }
}
