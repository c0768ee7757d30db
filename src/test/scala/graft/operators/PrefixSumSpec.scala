package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("runningTotal equals the single-window reference for every bucket width") {
    val rows = Seq(
      (3L, 10L), (7L, -2L), (7L, 5L), (12L, 1L), (13L, -4L),
      (25L, 2L), (26L, 2L), (90L, 7L), (91L, -7L), (91L, 3L))
    val df = rows.toDF("o", "v")
    val expect = df
      .withColumn("rt", sum(col("v")).over(Window.orderBy(col("o"))))
      .select("o", "v", "rt").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    for (w <- Seq(1L, 2L, 5L, 64L, 1000L)) {
      val got = PrefixSum.runningTotal(df, col("o"), col("v"), bucketWidth = w, out = "rt")
        .select("o", "v", "rt").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(got == expect, s"bucketWidth=$w")
    }
  }

  test("runningTotal uses RANGE tie semantics: tied order keys share one total") {
    val df = Seq((1L, 1L), (5L, 1L), (5L, 1L), (5L, -1L), (9L, 1L))
      .toDF("o", "v")
    val got = PrefixSum.runningTotal(df, col("o"), col("v"), bucketWidth = 4L, out = "rt")
      .select("o", "rt").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // at o=5 all three deltas are inside the frame for every tied row
    assert(got == Seq((1L, 1L), (5L, 2L), (5L, 2L), (5L, 2L), (9L, 3L)))
  }

  test("runningTotal carries offsets across buckets with NEGATIVE order keys") {
    val df = Seq((-7L, 1L), (-3L, 2L), (-1L, 3L), (0L, 4L), (6L, 5L))
      .toDF("o", "v")
    val got = PrefixSum.runningTotal(df, col("o"), col("v"), bucketWidth = 4L, out = "rt")
      .select("o", "rt").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq((-7L, 1L), (-3L, 3L), (-1L, 6L), (0L, 10L), (6L, 15L)))
  }

  test("runningTotal plans a PARTITIONED data window; only bucket totals see a global one") {
    // the data-sized window must carry a partition spec — the whole
    // point of the operator; the unpartitioned window may appear only
    // downstream of the bucket aggregation (frame = bucket count)
    val df = Seq((1L, 1L), (2L, 1L), (100L, 1L)).toDF("o", "v")
    val plan = PrefixSum.runningTotal(df, col("o"), col("v"), bucketWidth = 10L)
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      if (w.partitionSpec.isEmpty)
        assert(w.collect { case a: Aggregate => a }.nonEmpty,
          "unpartitioned window must sit over the bucket-total aggregate, not data rows")
    }
  }

  test("runningTotal rejects a non-positive bucket width") {
    val df = Seq((1L, 1L)).toDF("o", "v")
    intercept[IllegalArgumentException] {
      PrefixSum.runningTotal(df, col("o"), col("v"), bucketWidth = 0L)
    }
  }
}
