package graft.functions

import graft.SparkSpec
import graft.llm.Sketches
import org.apache.spark.sql.functions._

/** The native KMV aggregate against the DataFrame formulation: same
  * hashes, same order statistic, same estimator — the two paths must
  * be BIT-identical, partitioning must not matter, and the sketch
  * plan must move only bounded buffers (ObjectHashAggregate), not a
  * distinct exchange of every hash. */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def values(n: Int, dups: Int): org.apache.spark.sql.DataFrame =
    (0 until n).flatMap(i => Seq.fill(dups)(s"value-$i")).toDF("v")

  test("sketch estimate is bit-identical to the distinct/order-statistic path") {
    val df = values(5000, dups = 3)
    val viaShuffle = Sketches.kmvEstimate(df, col("v"), k = 256)
      .head().getDouble(0)
    val viaSketch = Sketches.kmvEstimateSketch(df, col("v"), k = 256)
      .head().getDouble(0)
    assert(viaSketch == viaShuffle) // exact bit equality, not tolerance
    // ~6% error at k=256 — sanity that the value is an estimate of 5000
    assert(math.abs(viaSketch - 5000.0) / 5000.0 < 0.2, viaSketch.toString)
  }

  test("below k distinct values the sketch is exact; duplicates never skew") {
    val df = values(100, dups = 7) // 700 rows, 100 distinct
    assert(Sketches.kmvEstimateSketch(df, col("v"), k = 256)
      .head().getDouble(0) == 100.0)
  }

  test("partitioning does not change the estimate (merge path)") {
    val df = values(5000, dups = 1)
    val one = Sketches.kmvEstimateSketch(df.coalesce(1), col("v"), k = 64)
      .head().getDouble(0)
    val many = Sketches.kmvEstimateSketch(df.repartition(16), col("v"), k = 64)
      .head().getDouble(0)
    assert(one == many)
  }

  test("the sketch plan aggregates objects — no distinct exchange of raw hashes") {
    val df = values(1000, dups = 1)
    val plan = Sketches.kmvEstimateSketch(df, col("v"), k = 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    // the DataFrame path pays a distinct (HashAggregate over h) before
    // its TakeOrdered; the sketch path must not
    assert(!plan.contains("TakeOrdered"), plan)
  }
}
