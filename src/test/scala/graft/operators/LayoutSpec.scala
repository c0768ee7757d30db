package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave in plain Scala. */
  private def zRef(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches the bit-interleave reference over a sweep") {
    val pts = for (a <- 0L until 32L; b <- 0L until 32L) yield (a, b)
    val got = pts.toDF("a", "b")
      .select($"a", $"b", Layout.zValue($"a", $"b", 5).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pts.foreach { case (a, b) =>
      assert(got((a, b)) == zRef(a, b, 5), s"z($a,$b)")
    }
  }

  test("z ordering gives locality in both dimensions: bucket rectangles are tight") {
    // 64x64 grid, 16 z-range buckets: each bucket must span at most a
    // 16x32 rectangle (z-curve quadrant geometry), so min/max stats
    // prune ~3/4 of buckets for a narrow predicate on EITHER dim —
    // the property a plain sort only has for its leading column.
    val pts = (for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)).toDF("a", "b")
    val stats = pts.select(Layout.zBucket($"a", $"b", 6, 4).as("bucket"), $"a", $"b")
      .groupBy("bucket")
      .agg(min($"a").as("minA"), max($"a").as("maxA"),
           min($"b").as("minB"), max($"b").as("maxB"))
      .collect()
    assert(stats.length == 16)
    stats.foreach { r =>
      assert(r.getLong(2) - r.getLong(1) <= 31, s"a-span in bucket ${r.getLong(0)}")
      assert(r.getLong(4) - r.getLong(3) <= 31, s"b-span in bucket ${r.getLong(0)}")
    }
    // predicate a IN [0,15]: only buckets whose a-range overlaps survive
    val scanA = stats.count(r => r.getLong(1) <= 15 && r.getLong(2) >= 0)
    val scanB = stats.count(r => r.getLong(3) <= 15 && r.getLong(4) >= 0)
    assert(scanA <= 8, s"a-predicate scans $scanA of 16 buckets")
    assert(scanB <= 8, s"b-predicate scans $scanB of 16 buckets")
  }

  test("clampDim is total: negatives to 0, overflow to the top cell") {
    val r = Seq(-5L, 0L, 17L, 300L).toDF("v")
      .select(Layout.clampDim($"v", 8).as("c")).collect().map(_.getLong(0))
    assert(r.toSeq == Seq(0L, 0L, 17L, 255L))
  }

  test("duck renderings are generated from the same loop (textual sanity)") {
    val z = Layout.duckZValue("x", "y", 2)
    assert(z == "(((((x) >> 0) & 1) << 0) + ((((y) >> 0) & 1) << 1) + ((((x) >> 1) & 1) << 2) + ((((y) >> 1) & 1) << 3))")
    assert(Layout.duckZBucket("x", "y", 2, 1) == s"($z >> 3)")
    assert(Layout.duckClampDim("v", 8) == "least(greatest(CAST(v AS BIGINT), 0), 255)")
  }

  test("zorderLayout is a single range exchange") {
    val df = (0L until 256L).map(i => (i % 16, i / 16)).toDF("a", "b")
    val plan = Layout.zorderLayout(df, $"a", $"b", bits = 4, partitions = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
  }

  test("zordered parquet lands tight per-file ranges: either predicate skips most files") {
    // The end-to-end point of the layout: after the range-partitioned
    // write, parquet footer min/max stats confine each FILE to a small
    // rectangle in BOTH dimensions, so a narrow predicate on either
    // column scans a minority of files. A plain sort by `a` would pass
    // the a-predicate check and fail the b one.
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val pts = (for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)).toDF("a", "b")
    Layout.zorderLayout(pts, $"a", $"b", bits = 6, partitions = 16)
      .write.mode("overwrite").parquet(dir)
    val stats = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min($"a").as("minA"), max($"a").as("maxA"),
           min($"b").as("minB"), max($"b").as("maxB"))
      .collect()
    assert(stats.length >= 8, s"expected a multi-file layout, got ${stats.length}")
    // a IN [0,7] and b IN [0,7] are each 1/8 of their range: both must
    // prune at least half the files (z-geometry actually gives ~3/4+,
    // but range-boundary sampling makes exact counts non-deterministic)
    val scanA = stats.count(r => r.getAs[Long]("minA") <= 7 && r.getAs[Long]("maxA") >= 0)
    val scanB = stats.count(r => r.getAs[Long]("minB") <= 7 && r.getAs[Long]("maxB") >= 0)
    assert(scanA <= stats.length / 2, s"a-predicate scans $scanA/${stats.length} files")
    assert(scanB <= stats.length / 2, s"b-predicate scans $scanB/${stats.length} files")
  }
}
