package graft.functions

import graft.SparkSpec
import graft.llm.Sketches
import org.apache.spark.sql.functions._

/** The native Count-Min aggregate: the one-sided error invariant
  * (estimate ≥ exact, always), partition-independence of the merged
  * counter matrix, total-mass conservation per depth row, and the
  * estimate path's hash agreement with the update path. */
class CmsSketchSpec extends SparkSpec {
  import spark.implicits._

  private def zipfish(n: Int): org.apache.spark.sql.DataFrame =
    (0 until n).flatMap(i => Seq.fill(1 + 2000 / (i + 1))(s"term-$i")).toDF("v")

  test("estimates dominate exact counts for EVERY key and match across partitionings") {
    val df = zipfish(300)
    val exact = df.groupBy("v").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def estimates(part: Int): Map[String, Long] = {
      val sketch = Sketches.cmsSketch(df.repartition(part), col("v"))
      df.select(col("v")).distinct()
        .crossJoin(broadcast(sketch))
        .withColumn("est", Sketches.cmsEstimate(col("cms"),
          Portable.baseHash31(col("v"))))
        .collect().map(r => r.getString(0) -> r.getAs[Long]("est")).toMap
    }
    val est1 = estimates(1)
    val est7 = estimates(7)
    assert(est1 == est7, "the merged counter matrix must not depend on partitioning")
    exact.foreach { case (k, c) =>
      assert(est1(k) >= c, s"CMS one-sided error violated for $k: est ${est1(k)} < exact $c")
    }
    // the heaviest key's estimate is tight-ish: its own mass dominates
    // any collision mass in a 256-wide row over this vocabulary
    assert(est1("term-0") < exact("term-0") * 2)
  }

  test("each depth row conserves total occurrence mass") {
    val df = zipfish(100)
    val total = df.count()
    val cms = Sketches.cmsSketch(df, col("v"), depth = 4, width = 256)
      .head().getSeq[Long](0)
    (0 until 4).foreach { i =>
      assert(cms.slice(i * 256, (i + 1) * 256).sum == total, s"row $i mass")
    }
  }

  test("a collision-free row yields the exact count") {
    // 2 distinct values, width 256: the chance a fixed universal row
    // collides them is small; with the FIXED coefficient family this
    // is deterministic — assert the estimates are exactly the counts
    val df = Seq.fill(5)("alpha").toDF("v").union(Seq.fill(9)("beta").toDF("v"))
    val sketch = Sketches.cmsSketch(df, col("v"))
    val got = Seq("alpha", "beta").toDF("v")
      .crossJoin(broadcast(sketch))
      .withColumn("est", Sketches.cmsEstimate(col("cms"), Portable.baseHash31(col("v"))))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("est")).toMap
    assert(got == Map("alpha" -> 5L, "beta" -> 9L))
  }
}
